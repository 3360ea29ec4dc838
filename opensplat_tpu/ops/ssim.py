"""SSIM loss, pure jnp (grouped conv2d on the VPU/MXU via XLA).

Reproduces the reference's SSIM (ssim.cpp:7-46, a port of
Po-Hsun-Su/pytorch-ssim) *including its asymmetric Gaussian window*:
the reference builds gauss[i] = exp(-floor((i - ws)/2)^2 / (2 sigma^2))
(ssim.cpp:43) rather than the usual centered |i - ws//2| — we replicate
it exactly since PSNR-parity training depends on the identical loss
surface. C1/C2 and the 11x11 / sigma=1.5 window match ssim.cpp:26-27,35.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _reference_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    i = np.arange(window_size, dtype=np.float64)
    k = np.floor((i - window_size) / 2.0)
    g = np.exp(-(k ** 2) / (2.0 * sigma * sigma))
    g = g / g.sum()
    w2d = np.outer(g, g)
    return w2d.astype(np.float32)


_WINDOW = _reference_window()


def _gauss_1d(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    i = np.arange(window_size, dtype=np.float64)
    k = np.floor((i - window_size) / 2.0)
    g = np.exp(-(k ** 2) / (2.0 * sigma * sigma))
    return (g / g.sum()).astype(np.float32)


def _band_matrix(n: int, g1d: np.ndarray) -> np.ndarray:
    """Banded blur matrix B with B[i, j] = g1d[j - i + pad] (zero padding):
    B @ x == 'same' 1D convolution of x with g1d. The separable 11x11 blur
    becomes two dense matmuls — MXU-friendly, vs a 3-channel grouped conv
    which TPUs execute ~50x slower (tiny channel count cannot tile onto
    the MXU; measured 15ms -> 0.3ms at 512x512)."""
    k = len(g1d)
    pad = k // 2
    b = np.zeros((n, n), np.float32)
    for off in range(-pad, pad + 1):
        d = np.full(n - abs(off), g1d[off + pad], np.float32)
        b += np.diag(d, k=off)
    return b


_blur_cache = {}


def _blur_mats(h: int, w: int):
    # cache holds NUMPY arrays only: caching jnp arrays created during a
    # trace would leak tracers across jit boundaries
    key = (h, w)
    if key not in _blur_cache:
        g = _gauss_1d()
        _blur_cache[key] = (_band_matrix(h, g), _band_matrix(w, g))
    bh, bw = _blur_cache[key]
    return jnp.asarray(bh), jnp.asarray(bw)


def _blur(img: jax.Array, bh: jax.Array, bw: jax.Array) -> jax.Array:
    """Separable Gaussian 'same' blur of (H, W, C) via two matmuls.

    precision=HIGHEST is load-bearing: the TPU default (bf16 passes)
    corrupts the E[x^2]-E[x]^2 variance estimate enough to flip SSIM-map
    denominators negative (observed SSIM ~180 on real renders)."""
    hi = jax.lax.Precision.HIGHEST
    t = jnp.einsum("ih,hwc->iwc", bh, img, precision=hi)
    return jnp.einsum("jw,iwc->ijc", bw, t, precision=hi)


@partial(jax.jit, static_argnames=())
def ssim(rendered: jax.Array, gt: jax.Array) -> jax.Array:
    """Mean SSIM between two (H, W, 3) images in [0, 1].

    Argument order matches Model::mainLoss usage: ssim.eval(rendered, gt)
    with img1 = gt, img2 = rendered internally (ssim.cpp:9-10); SSIM is
    symmetric so the distinction only matters for fp determinism.
    """
    h, w = gt.shape[0], gt.shape[1]
    bh, bw = _blur_mats(h, w)
    img1 = gt.astype(jnp.float32)
    img2 = rendered.astype(jnp.float32)

    mu1 = _blur(img1, bh, bw)
    mu2 = _blur(img2, bh, bw)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _blur(img1 * img1, bh, bw) - mu1_sq
    sigma2_sq = _blur(img2 * img2, bh, bw) - mu2_sq
    sigma12 = _blur(img1 * img2, bh, bw) - mu1_mu2

    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    ssim_map = ((2.0 * mu1_mu2 + c1) * (2.0 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map.mean()


def l1(rendered: jax.Array, gt: jax.Array) -> jax.Array:
    """Mean absolute error (model.cpp:54-56)."""
    return jnp.abs(gt - rendered).mean()


def psnr(rendered: jax.Array, gt: jax.Array) -> jax.Array:
    """Peak signal-to-noise ratio in dB (model.cpp:49-52)."""
    mse = jnp.mean((rendered - gt) ** 2)
    return 10.0 * jnp.log10(1.0 / mse)


def main_loss(rendered: jax.Array, gt: jax.Array, ssim_weight: float) -> jax.Array:
    """(1-w) * L1 + w * (1 - SSIM)  (model.cpp:780-784)."""
    return (1.0 - ssim_weight) * l1(rendered, gt) + ssim_weight * (
        1.0 - ssim(rendered, gt)
    )
