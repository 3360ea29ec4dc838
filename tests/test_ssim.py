"""SSIM / loss parity vs an independent torch-CPU implementation of the
reference's exact formula (ssim.cpp)."""
import numpy as np
import jax.numpy as jnp

from opensplat_tpu.ops.ssim import ssim, l1, psnr, main_loss


def _torch_reference_ssim(rendered, gt, window_size=11, sigma=1.5):
    import torch
    import torch.nn.functional as F

    i = torch.arange(window_size, dtype=torch.float32)
    k = torch.floor((i - window_size) / 2.0)
    g = torch.exp(-(k ** 2) / (2.0 * sigma * sigma))
    g = g / g.sum()
    w = g[:, None] @ g[None, :]
    window = w[None, None].expand(3, 1, window_size, window_size).contiguous()

    img1 = torch.from_numpy(gt).permute(2, 0, 1)[None]
    img2 = torch.from_numpy(rendered).permute(2, 0, 1)[None]
    pad = window_size // 2
    conv = lambda x: F.conv2d(x, window, padding=pad, groups=3)
    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = conv(img1 * img1) - mu1_sq
    s2 = conv(img2 * img2) - mu2_sq
    s12 = conv(img1 * img2) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return float(m.mean())


def test_ssim_matches_torch_reference():
    rng = np.random.default_rng(0)
    gt = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
    rendered = np.clip(gt + rng.normal(0, 0.08, gt.shape), 0, 1).astype(np.float32)
    got = float(ssim(jnp.asarray(rendered), jnp.asarray(gt)))
    want = _torch_reference_ssim(rendered, gt)
    assert abs(got - want) < 1e-5, (got, want)


def test_ssim_identical_images():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    assert float(ssim(jnp.asarray(img), jnp.asarray(img))) > 0.999


def test_l1_psnr_main_loss():
    rng = np.random.default_rng(2)
    gt = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    r = np.clip(gt + 0.1, 0, 1).astype(np.float32)
    np.testing.assert_allclose(float(l1(jnp.asarray(r), jnp.asarray(gt))),
                               np.abs(gt - r).mean(), rtol=1e-6)
    mse = ((r - gt) ** 2).mean()
    np.testing.assert_allclose(float(psnr(jnp.asarray(r), jnp.asarray(gt))),
                               10 * np.log10(1 / mse), rtol=1e-5)
    w = 0.2
    want = (1 - w) * np.abs(gt - r).mean() + w * (1 - _torch_reference_ssim(r, gt))
    np.testing.assert_allclose(
        float(main_loss(jnp.asarray(r), jnp.asarray(gt), w)), want, rtol=1e-4
    )
