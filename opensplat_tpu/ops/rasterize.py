"""Differentiable alpha-compositing rasterizer (dense, depth-sorted).

This is the framework's *conformance* renderer: a pure-jnp, static-shape
implementation whose forward image and backward gradients match the
reference CPU backend (gsplat-cpu/gsplat_cpu.cpp:137-376) to float32
accuracy. It is the numerical anchor for the Pallas tile kernel, the
interpret-mode fallback, and the renderer for small scenes.

Design (TPU-first, not a translation of the scalar C++ loops):
  * Gaussians are depth-sorted once (XLA sort) and processed in chunks of
    K with `lax.scan`; per chunk, all P pixels evaluate K Gaussians as a
    (P, K) block — VPU elementwise math plus one (P, K) @ (K, 3) MXU
    matmul for color accumulation.
  * Sequential front-to-back compositing becomes a within-chunk cumulative
    product over K plus a per-pixel carry (T, done) across chunks —
    mathematically identical to the reference's per-Gaussian loop,
    including early-termination semantics:
      - skip if sigma < 0 or alpha < 1/255          (gsplat_cpu.cpp:219-221)
      - alpha clamped to 0.999 in forward           (gsplat_cpu.cpp:220)
      - pixel done once T would drop <= 1e-4; the crossing Gaussian is
        NOT composited                              (gsplat_cpu.cpp:223-228)
  * The backward is a custom VJP (reverse-order scan) that reproduces the
    reference backward exactly, *including its quirks*:
      - alpha re-clamped at 0.99 (not 0.999)        (gsplat_cpu.cpp:338)
      - transmittance recovered by division from final T
      - d(alpha)/d(sigma) ignores the clamp         (gsplat_cpu.cpp:362)
      - background term in v_alpha                  (gsplat_cpu.cpp:349-356)
    Gradient accumulation is a deterministic reduction per chunk — no
    atomics (TPU has none; a determinism improvement over the reference's
    CUDA atomicAdd).

The forward saves only the per-chunk carry (T_in, done_in): O(P * N / K)
floats, so the backward rematerializes each chunk locally — the same idea
as the CUDA kernel's final_Ts/final_index replay (backward.cu:196-253),
re-expressed functionally.

Dead / invisible Gaussians are handled by zeroing their opacity before the
kernel: alpha == 0 < 1/255 is skipped identically in forward and backward,
so no separate mask needs to thread through the custom VJP.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

ALPHA_THRESH = 1.0 / 255.0
T_EPS = 1e-4
FWD_ALPHA_CLAMP = 0.999
BWD_ALPHA_CLAMP = 0.99


def _pad_to_multiple(x: jax.Array, k: int, axis: int = 0, value=0):
    n = x.shape[axis]
    pad = (-n) % k
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _pick_chunk(n: int) -> int:
    for c in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if n % c == 0:
            return c
    return 1


def _pixel_grid(height: int, width: int):
    # reference pixel deltas: xCam = gX - j (column), yCam = gY - i (row)
    px = jnp.arange(width, dtype=jnp.float32)
    py = jnp.arange(height, dtype=jnp.float32)
    jj, ii = jnp.meshgrid(px, py)  # (H, W)
    return jj.reshape(-1), ii.reshape(-1)  # (P,)


def _reshape_chunks(x: jax.Array, n_chunks: int, chunk: int):
    return x.reshape((n_chunks, chunk) + x.shape[1:])


def _fwd_chunk_step(carry, chunk, pjj, pii):
    T, done, out = carry
    gx, gy, A, B, C, op, col = chunk
    dx = gx[None, :] - pjj[:, None]  # (P, K)
    dy = gy[None, :] - pii[:, None]
    sigma = 0.5 * (A[None] * dx * dx + C[None] * dy * dy) + B[None] * dx * dy
    alpha = jnp.minimum(FWD_ALPHA_CLAMP, op[None] * jnp.exp(-sigma))
    used = (sigma >= 0.0) & (alpha >= ALPHA_THRESH) & (~done)[:, None]
    a = jnp.where(used, alpha, 0.0)
    one_minus = 1.0 - a
    ecp = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(one_minus[:, :1]), one_minus[:, :-1]], axis=1),
        axis=1,
    )
    Tb = T[:, None] * ecp  # T before each Gaussian (valid up to first stop)
    stop = used & (Tb * one_minus <= T_EPS)
    stopped = jnp.cumsum(stop.astype(jnp.int32), axis=1) > 0
    comp = used & ~stopped
    a_eff = jnp.where(comp, a, 0.0)
    ecp_eff = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(a_eff[:, :1]), 1.0 - a_eff[:, :-1]], axis=1),
        axis=1,
    )
    vis = a_eff * T[:, None] * ecp_eff
    out = out + jnp.dot(vis, col, preferred_element_type=jnp.float32)
    T_new = T * jnp.prod(1.0 - a_eff, axis=1)
    done_new = done | jnp.any(stop, axis=1)
    return (T_new, done_new, out), (T, done)


def _forward_scan(xys_s, conics_s, colors_s, opac_s, background, height, width):
    chunk = _pick_chunk(xys_s.shape[0])
    n_chunks = xys_s.shape[0] // chunk
    pjj, pii = _pixel_grid(height, width)
    P = height * width
    chunks = tuple(
        _reshape_chunks(x, n_chunks, chunk)
        for x in (
            xys_s[:, 0],
            xys_s[:, 1],
            conics_s[:, 0],
            conics_s[:, 1],
            conics_s[:, 2],
            opac_s,
            colors_s,
        )
    )
    init = (
        jnp.ones((P,), jnp.float32),
        jnp.zeros((P,), bool),
        jnp.zeros((P, colors_s.shape[-1]), jnp.float32),
    )
    (T_final, _done, out), (T_ins, done_ins) = jax.lax.scan(
        partial(_fwd_chunk_step, pjj=pjj, pii=pii), init, chunks
    )
    out = out + T_final[:, None] * background[None, :]
    return out, T_final, T_ins, done_ins


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _rasterize_sorted(xys_s, conics_s, colors_s, opac_s, background, height, width):
    out, T_final, _, _ = _forward_scan(
        xys_s, conics_s, colors_s, opac_s, background, height, width
    )
    return (
        out.reshape(height, width, -1),
        T_final.reshape(height, width),
    )


def _rasterize_sorted_fwd(xys_s, conics_s, colors_s, opac_s, background, height, width):
    out, T_final, T_ins, done_ins = _forward_scan(
        xys_s, conics_s, colors_s, opac_s, background, height, width
    )
    res = (xys_s, conics_s, colors_s, opac_s, background, T_final, T_ins, done_ins)
    return (out.reshape(height, width, -1), T_final.reshape(height, width)), res


def _bwd_chunk_step(carry, chunk, pjj, pii, v_out, v_oa, T_final, bg_dot_vout):
    """One chunk of the reverse (back-to-front) gradient replay."""
    T_run, buffer = carry  # (P,), (P, 3)
    gx, gy, A, B, C, op, col, T_in, done_in = chunk
    dx = gx[None, :] - pjj[:, None]
    dy = gy[None, :] - pii[:, None]
    sigma = 0.5 * (A[None] * dx * dx + C[None] * dy * dy) + B[None] * dx * dy
    vis_u = jnp.exp(-sigma)
    alpha_f = jnp.minimum(FWD_ALPHA_CLAMP, op[None] * vis_u)
    used = (sigma >= 0.0) & (alpha_f >= ALPHA_THRESH) & (~done_in)[:, None]
    a_f = jnp.where(used, alpha_f, 0.0)
    ecp = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(a_f[:, :1]), 1.0 - a_f[:, :-1]], axis=1), axis=1
    )
    Tb = T_in[:, None] * ecp
    stop = used & (Tb * (1.0 - a_f) <= T_EPS)
    stopped = jnp.cumsum(stop.astype(jnp.int32), axis=1) > 0
    comp = used & ~stopped  # the composited (px2gid) set for this chunk

    alpha_b = jnp.where(comp, jnp.minimum(BWD_ALPHA_CLAMP, op[None] * vis_u), 0.0)
    ra = 1.0 / (1.0 - alpha_b)  # == 1 where not composited
    suf_incl = jnp.flip(jnp.cumprod(jnp.flip(ra, axis=1), axis=1), axis=1)
    T_k = T_run[:, None] * suf_incl  # T after the *= ra of the reference loop
    fac = alpha_b * T_k

    contrib = fac[:, :, None] * col[None, :, :]  # (P, K, 3)
    csum = jnp.cumsum(jnp.flip(contrib, axis=1), axis=1)
    suf_excl = jnp.flip(
        jnp.concatenate([jnp.zeros_like(csum[:, :1]), csum[:, :-1]], axis=1), axis=1
    )
    buffer_k = buffer[:, None, :] + suf_excl

    v_alpha = (
        jnp.sum(
            (col[None] * T_k[:, :, None] - buffer_k * ra[:, :, None]) * v_out[:, None, :],
            axis=-1,
        )
        # d final_T / d alpha_k = -final_T / (1 - alpha_k); the reference's
        # "+Tfinal*ra*v_outAlpha" term is this with out_alpha = 1 - final_T
        - T_final[:, None] * ra * v_oa[:, None]
        - T_final[:, None] * ra * bg_dot_vout[:, None]
    )
    v_alpha = jnp.where(comp, v_alpha, 0.0)
    v_sigma = -op[None] * vis_u * v_alpha

    v_col = jnp.einsum("pk,pc->kc", fac, v_out)
    v_con = 0.5 * jnp.stack(
        [
            jnp.sum(v_sigma * dx * dx, axis=0),
            jnp.sum(v_sigma * dx * dy, axis=0),
            jnp.sum(v_sigma * dy * dy, axis=0),
        ],
        axis=-1,
    )
    v_xy = jnp.stack(
        [
            jnp.sum(v_sigma * (A[None] * dx + B[None] * dy), axis=0),
            jnp.sum(v_sigma * (B[None] * dx + C[None] * dy), axis=0),
        ],
        axis=-1,
    )
    v_op = jnp.sum(vis_u * v_alpha, axis=0)

    carry_new = (T_run * jnp.prod(ra, axis=1), buffer + jnp.sum(contrib, axis=1))
    return carry_new, (v_xy, v_con, v_col, v_op)


def _rasterize_sorted_bwd(height, width, res, cotangents):
    xys_s, conics_s, colors_s, opac_s, background, T_final, T_ins, done_ins = res
    v_img, v_alpha_img = cotangents
    chunk = _pick_chunk(xys_s.shape[0])
    n_chunks = xys_s.shape[0] // chunk
    pjj, pii = _pixel_grid(height, width)
    P = height * width
    ch = colors_s.shape[-1]
    v_out = v_img.reshape(P, ch).astype(jnp.float32)
    v_oa = v_alpha_img.reshape(P).astype(jnp.float32)
    bg_dot_vout = v_out @ background

    chunks = tuple(
        _reshape_chunks(x, n_chunks, chunk)
        for x in (
            xys_s[:, 0],
            xys_s[:, 1],
            conics_s[:, 0],
            conics_s[:, 1],
            conics_s[:, 2],
            opac_s,
            colors_s,
        )
    ) + (T_ins, done_ins)

    init = (T_final, jnp.zeros((P, ch), jnp.float32))
    _, (v_xy_c, v_con_c, v_col_c, v_op_c) = jax.lax.scan(
        partial(
            _bwd_chunk_step,
            pjj=pjj,
            pii=pii,
            v_out=v_out,
            v_oa=v_oa,
            T_final=T_final,
            bg_dot_vout=bg_dot_vout,
        ),
        init,
        chunks,
        reverse=True,
    )
    n = xys_s.shape[0]
    v_xys = v_xy_c.reshape(n, 2)
    v_conics = v_con_c.reshape(n, 3)
    v_colors = v_col_c.reshape(n, ch)
    v_opac = v_op_c.reshape(n)
    # background gradient: out += T_final * bg  (exact; reference never uses it)
    v_bg = T_final @ v_out
    return v_xys, v_conics, v_colors, v_opac, v_bg


_rasterize_sorted.defvjp(_rasterize_sorted_fwd, _rasterize_sorted_bwd)


def rasterize(
    xys: jax.Array,
    conics: jax.Array,
    colors: jax.Array,
    opacities: jax.Array,
    depths: jax.Array,
    valid: jax.Array,
    background: jax.Array,
    height: int,
    width: int,
) -> Tuple[jax.Array, jax.Array]:
    """Depth-sort and rasterize N Gaussians to an (H, W, CH) image.

    colors: (N, CH) for any channel count CH — covers both the reference's
    3-channel fast path and its generic nd_rasterize variant
    (forward.cu:174-254); background must be (CH,).
    opacities: (N,) or (N,1) post-sigmoid. valid: (N,) bool (alive and
    radii > 0). Differentiable wrt xys, conics, colors, opacities, and
    background with reference-CPU backward semantics.
    Returns (img(H,W,CH), final_T(H,W)).
    """
    opacities = opacities.reshape(-1)
    key = jnp.where(valid, depths, jnp.inf)
    order = jax.lax.stop_gradient(jnp.argsort(key))
    xys_s = jnp.take(xys, order, axis=0)
    conics_s = jnp.take(conics, order, axis=0)
    colors_s = jnp.take(colors, order, axis=0)
    opac_s = jnp.take(opacities, order, axis=0)
    valid_s = jnp.take(valid, order, axis=0)
    # invalid slots never composite nor receive gradient: alpha == 0 < 1/255
    opac_s = jnp.where(valid_s, opac_s, 0.0)

    # pad to a multiple of the chunk size so the scan sees uniform chunks
    if xys_s.shape[0] % 256 != 0:
        xys_s = _pad_to_multiple(xys_s, 256)
        conics_s = _pad_to_multiple(conics_s, 256)
        colors_s = _pad_to_multiple(colors_s, 256)
        opac_s = _pad_to_multiple(opac_s, 256)

    return _rasterize_sorted(
        xys_s,
        conics_s,
        colors_s,
        opac_s,
        background.astype(jnp.float32),
        height,
        width,
    )


# Generic-channel alias matching the reference's nd_rasterize entry points
# (forward.cu:174-254, backward.cu:15-129): the dense renderer is already
# channel-generic.
nd_rasterize = rasterize
