"""Tile-binned rasterizer over the sorted intersection stream (pure jnp).

This is the production XLA renderer: work is proportional to the TRUE
intersection count (sum of per-tile Gaussian counts) like the reference
CUDA kernel (forward.cu:256-378), not to N x pixels like the dense
conformance renderer. The Pallas kernel shares its binning and semantics.

Design: after binning (binning.py), intersections arrive sorted by
(tile, depth). We scan the stream in chunks of K; within a chunk each
intersection composites into its own tile's 16x16 = 256 pixels as a
(K, 256) block. Sequential front-to-back order within a tile becomes a
*segmented* (per-tile-run) cumulative product in log space; per-tile carry
state (T, done, accumulated color) lives in (num_tiles, 256) arrays
updated with unique-index scatters at segment boundaries — all
deterministic, no atomics.

Early-termination parity with the reference: instead of saving per-chunk
transmittance snapshots, the forward records per pixel the global index
of the intersection that crossed T <= 1e-4 (`final_idx`, the analogue of
the CUDA kernel's final_index, forward.cu:367-377). The backward replays
back-to-front, recovering T by division from final_T exactly like
backward.cu:161-355 / gsplat_cpu.cpp:313-372, with the reference's
0.99-clamp quirk. Per-intersection gradients are reduced per tile then
scatter-added over Gaussian ids (deterministic XLA scatter).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .binning import bin_gaussians, num_tiles
from .projection import BLOCK_X, BLOCK_Y
from .rasterize import ALPHA_THRESH, BWD_ALPHA_CLAMP, FWD_ALPHA_CLAMP, T_EPS

PIX_PER_TILE = BLOCK_X * BLOCK_Y  # 256
_BIG = jnp.iinfo(jnp.int32).max


def _tile_pixel_offsets():
    p = jnp.arange(PIX_PER_TILE, dtype=jnp.float32)
    return p % BLOCK_X, p // BLOCK_X  # (x offsets, y offsets)


def _chunk_geometry(gid, tid, xys, conics, opac, tb_x, n_tiles, c):
    """Gather per-isect Gaussian data and compute (K, 256) sigma blocks."""
    g = jnp.minimum(gid, c - 1)
    t = jnp.minimum(tid, n_tiles - 1)
    gx = xys[g, 0][:, None]
    gy = xys[g, 1][:, None]
    A = conics[g, 0][:, None]
    B = conics[g, 1][:, None]
    C_ = conics[g, 2][:, None]
    op = opac[g][:, None]
    lx, ly = _tile_pixel_offsets()
    px = (t % tb_x).astype(jnp.float32)[:, None] * BLOCK_X + lx[None, :]
    py = (t // tb_x).astype(jnp.float32)[:, None] * BLOCK_Y + ly[None, :]
    dx = gx - px
    dy = gy - py
    sigma = 0.5 * (A * dx * dx + C_ * dy * dy) + B * dx * dy
    return g, t, dx, dy, sigma, op, A, B, C_


def _segment_bounds(tid):
    """Within-chunk run boundaries of the sorted tile ids."""
    seg_start = jnp.searchsorted(tid, tid, side="left").astype(jnp.int32)
    seg_end = jnp.searchsorted(tid, tid, side="right").astype(jnp.int32) - 1
    k = tid.shape[0]
    idx = jnp.arange(k, dtype=jnp.int32)
    is_first = idx == seg_start
    is_last = idx == seg_end
    return seg_start, seg_end, is_first, is_last


def _excl_cumsum(x, axis=0):
    c = jnp.cumsum(x, axis=axis)
    return c - x, c  # (exclusive, inclusive)


def _fwd_chunk(carry, chunk, *, xys, conics, colors, opac, tb_x, n_tiles, c, chunk_size):
    T_state, done_state, out_state, final_idx = carry
    gid, tid, base_idx = chunk
    valid = gid < c
    g, t, dx, dy, sigma, op, A, B, C_ = _chunk_geometry(
        gid, tid, xys, conics, opac, tb_x, n_tiles, c
    )
    seg_start, seg_end, is_first, is_last = _segment_bounds(tid)

    T_in = T_state[t]  # (K, 256)
    done_in = done_state[t]
    alpha = jnp.minimum(FWD_ALPHA_CLAMP, op * jnp.exp(-sigma))
    used = valid[:, None] & (sigma >= 0.0) & (alpha >= ALPHA_THRESH) & ~done_in
    a_f = jnp.where(used, alpha, 0.0)

    la = jnp.log1p(-a_f)
    excl, incl = _excl_cumsum(la)
    base = excl[seg_start]
    Tb = T_in * jnp.exp(excl - base)
    stop = used & (Tb * (1.0 - a_f) <= T_EPS)

    # first-stop recording: scatter-min of global isect indices
    k = gid.shape[0]
    gi = (base_idx + jnp.arange(k, dtype=jnp.int32))[:, None]
    stop_idx = jnp.where(stop, gi, _BIG)
    t_scatter = jnp.where(valid, t, n_tiles)  # drop invalid rows
    final_idx = final_idx.at[t_scatter].min(stop_idx, mode="drop")

    # composited set: used and strictly before the first stop of this pixel
    comp = used & (gi < final_idx[t])
    a_eff = jnp.where(comp, a_f, 0.0)
    la_eff = jnp.log1p(-a_eff)
    excl_e, incl_e = _excl_cumsum(la_eff)
    base_e = excl_e[seg_start]
    Tb_e = T_in * jnp.exp(excl_e - base_e)
    vis = a_eff * Tb_e  # (K, 256)
    contrib = vis[:, :, None] * colors[g][:, None, :]  # (K, 256, 3)

    # per-segment totals at run-last rows (unique tiles within the chunk)
    contrib_excl, contrib_incl = _excl_cumsum(contrib)
    seg_contrib = contrib_incl - contrib_excl[seg_start]  # inclusive within seg
    seg_logT = incl_e - base_e
    stop_cnt_excl, stop_cnt_incl = _excl_cumsum(stop.astype(jnp.int32))
    seg_stop_any = (stop_cnt_incl - stop_cnt_excl[seg_start]) > 0

    t_last = jnp.where(valid & is_last, t, n_tiles)
    out_state = out_state.at[t_last].add(seg_contrib, mode="drop")
    T_state = T_state.at[t_last].set(T_in * jnp.exp(seg_logT), mode="drop")
    done_state = done_state.at[t_last].set(done_in | seg_stop_any, mode="drop")

    return (T_state, done_state, out_state, final_idx), None


def _forward_scan(xys, conics, colors, opac, gauss_ids, tile_ids,
                  tb_x, tb_y, chunk_size):
    n_tiles = tb_x * tb_y
    c = xys.shape[0]
    I = gauss_ids.shape[0]
    n_chunks = I // chunk_size

    init = (
        jnp.ones((n_tiles, PIX_PER_TILE), jnp.float32),
        jnp.zeros((n_tiles, PIX_PER_TILE), bool),
        # channel-generic (nd_ parity, forward.cu:174-254): accumulator
        # width follows the colors operand
        jnp.zeros((n_tiles, PIX_PER_TILE, colors.shape[-1]), jnp.float32),
        jnp.full((n_tiles, PIX_PER_TILE), _BIG, jnp.int32),
    )
    chunks = (
        gauss_ids.reshape(n_chunks, chunk_size),
        tile_ids.reshape(n_chunks, chunk_size),
        jnp.arange(n_chunks, dtype=jnp.int32) * chunk_size,
    )
    step = partial(
        _fwd_chunk, xys=xys, conics=conics, colors=colors, opac=opac,
        tb_x=tb_x, n_tiles=n_tiles, c=c, chunk_size=chunk_size,
    )
    (T_state, done_state, out_state, final_idx), _ = jax.lax.scan(step, init, chunks)
    return T_state, out_state, final_idx


def _tiles_to_image(tiled, tb_x, tb_y, height, width):
    """(T, 256, ...) -> (H, W, ...) crop."""
    extra = tiled.shape[2:]
    img = tiled.reshape((tb_y, tb_x, BLOCK_Y, BLOCK_X) + extra)
    img = jnp.moveaxis(img, 2, 1).reshape((tb_y * BLOCK_Y, tb_x * BLOCK_X) + extra)
    return img[:height, :width]


def _image_to_tiles(img, tb_x, tb_y, height, width):
    """(H, W, ...) -> (T, 256, ...) zero-pad."""
    extra = img.shape[2:]
    pad_h = tb_y * BLOCK_Y - height
    pad_w = tb_x * BLOCK_X - width
    img = jnp.pad(img, [(0, pad_h), (0, pad_w)] + [(0, 0)] * len(extra))
    img = img.reshape((tb_y, BLOCK_Y, tb_x, BLOCK_X) + extra)
    img = jnp.moveaxis(img, 1, 2).reshape((tb_y * tb_x, PIX_PER_TILE) + extra)
    return img


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _rasterize_binned(xys, conics, colors, opac, background,
                      gauss_ids, tile_ids, height, width, chunk_size):
    tb_x, tb_y = num_tiles(height, width)
    T_state, out_state, _ = _forward_scan(
        xys, conics, colors, opac, gauss_ids, tile_ids, tb_x, tb_y, chunk_size
    )
    out_state = out_state + T_state[..., None] * background[None, None, :]
    img = _tiles_to_image(out_state, tb_x, tb_y, height, width)
    final_t = _tiles_to_image(T_state, tb_x, tb_y, height, width)
    return img, final_t


def _rasterize_binned_fwd(xys, conics, colors, opac, background,
                          gauss_ids, tile_ids, height, width, chunk_size):
    tb_x, tb_y = num_tiles(height, width)
    T_state, out_state, final_idx = _forward_scan(
        xys, conics, colors, opac, gauss_ids, tile_ids, tb_x, tb_y, chunk_size
    )
    out_full = out_state + T_state[..., None] * background[None, None, :]
    img = _tiles_to_image(out_full, tb_x, tb_y, height, width)
    final_t = _tiles_to_image(T_state, tb_x, tb_y, height, width)
    res = (xys, conics, colors, opac, background, gauss_ids, tile_ids,
           T_state, final_idx)
    return (img, final_t), res


def _bwd_chunk(carry, chunk, *, xys, conics, colors, opac, v_out_t, v_oa_t,
               T_final_t, bg_dot_vout_t, tb_x, n_tiles, c, final_idx):
    T_run_state, buffer_state = carry
    gid, tid, base_idx = chunk
    valid = gid < c
    g, t, dx, dy, sigma, op, A, B, C_ = _chunk_geometry(
        gid, tid, xys, conics, opac, tb_x, n_tiles, c
    )
    seg_start, seg_end, is_first, is_last = _segment_bounds(tid)
    k = gid.shape[0]
    gi = (base_idx + jnp.arange(k, dtype=jnp.int32))[:, None]

    vis_u = jnp.exp(-sigma)
    alpha_f = jnp.minimum(FWD_ALPHA_CLAMP, op * vis_u)
    comp = (
        valid[:, None]
        & (sigma >= 0.0)
        & (alpha_f >= ALPHA_THRESH)
        & (gi < final_idx[t])
    )
    alpha_b = jnp.where(comp, jnp.minimum(BWD_ALPHA_CLAMP, op * vis_u), 0.0)
    lra = -jnp.log1p(-alpha_b)  # log(ra)

    # within-segment inclusive suffix sums (back-to-front order)
    rev_excl, rev_incl = _excl_cumsum(jnp.flip(lra, axis=0))
    sfx_incl = jnp.flip(rev_incl, axis=0)
    sfx_base = jnp.flip(rev_excl, axis=0)[seg_end]  # suffix beyond segment end
    seg_sfx = sfx_incl - sfx_base

    T_run = T_run_state[t]
    T_k = T_run * jnp.exp(seg_sfx)  # T after the *= ra of the reference loop
    fac = alpha_b * T_k  # (K, 256)
    col = colors[g]  # (K, 3)
    contrib = fac[:, :, None] * col[:, None, :]

    crev_excl, crev_incl = _excl_cumsum(jnp.flip(contrib, axis=0))
    csfx_excl = jnp.flip(crev_excl, axis=0)  # sum_{j > i} contrib_j (whole chunk)
    # suffix-exclusive within segment: sum_{j > i in seg} contrib_j
    seg_csfx_excl = csfx_excl - csfx_excl[seg_end]
    buffer_k = buffer_state[t] + seg_csfx_excl

    ra = jnp.exp(lra)
    v_out = v_out_t[t]  # (K, 256, 3)
    v_oa = v_oa_t[t]
    T_final = T_final_t[t]
    bg_dot = bg_dot_vout_t[t]
    v_alpha = (
        jnp.sum((col[:, None, :] * T_k[:, :, None] - buffer_k * ra[:, :, None]) * v_out, axis=-1)
        - T_final * ra * v_oa
        - T_final * ra * bg_dot
    )
    v_alpha = jnp.where(comp, v_alpha, 0.0)
    v_sigma = -op * vis_u * v_alpha

    v_col_i = jnp.einsum("kp,kpc->kc", fac, v_out)
    v_con_i = 0.5 * jnp.stack(
        [
            jnp.sum(v_sigma * dx * dx, axis=1),
            jnp.sum(v_sigma * dx * dy, axis=1),
            jnp.sum(v_sigma * dy * dy, axis=1),
        ],
        axis=-1,
    )
    v_xy_i = jnp.stack(
        [
            jnp.sum(v_sigma * (A * dx + B * dy), axis=1),
            jnp.sum(v_sigma * (B * dx + C_ * dy), axis=1),
        ],
        axis=-1,
    )
    v_op_i = jnp.sum(vis_u * v_alpha, axis=1)

    # carry updates at run-first rows (unique tiles)
    seg_total_lra = sfx_incl[seg_start] - sfx_base  # == sum over segment
    seg_total_contrib = (
        jnp.flip(crev_incl, axis=0)[seg_start] - jnp.flip(crev_excl, axis=0)[seg_end]
    )
    t_first = jnp.where(valid & is_first, t, n_tiles)
    T_run_state = T_run_state.at[t_first].set(T_run * jnp.exp(seg_total_lra), mode="drop")
    buffer_state = buffer_state.at[t_first].set(
        buffer_state[t] + seg_total_contrib, mode="drop"
    )
    # sanitize per-isect gradients (degenerate splats can overflow the
    # f32 chain; a nonfinite row would poison its Gaussian's parameters
    # through Adam) — same guard as the pallas kernel's record emission
    fin = lambda v: jnp.where(jnp.isfinite(v), v, 0.0)
    return (T_run_state, buffer_state), (
        fin(v_xy_i), fin(v_con_i), fin(v_col_i), fin(v_op_i)
    )


def _rasterize_binned_bwd(height, width, chunk_size, res, cotangents):
    (xys, conics, colors, opac, background, gauss_ids, tile_ids,
     T_final_state, final_idx) = res
    v_img, v_ft = cotangents
    tb_x, tb_y = num_tiles(height, width)
    n_tiles = tb_x * tb_y
    c = xys.shape[0]
    I = gauss_ids.shape[0]
    n_chunks = I // chunk_size

    v_out_t = _image_to_tiles(v_img.astype(jnp.float32), tb_x, tb_y, height, width)
    v_oa_t = _image_to_tiles(v_ft.astype(jnp.float32), tb_x, tb_y, height, width)
    bg_dot_t = v_out_t @ background

    chunks = (
        gauss_ids.reshape(n_chunks, chunk_size),
        tile_ids.reshape(n_chunks, chunk_size),
        jnp.arange(n_chunks, dtype=jnp.int32) * chunk_size,
    )
    init = (
        T_final_state,
        jnp.zeros((n_tiles, PIX_PER_TILE, colors.shape[-1]), jnp.float32),
    )
    step = partial(
        _bwd_chunk, xys=xys, conics=conics, colors=colors, opac=opac,
        v_out_t=v_out_t, v_oa_t=v_oa_t, T_final_t=T_final_state,
        bg_dot_vout_t=bg_dot_t, tb_x=tb_x, n_tiles=n_tiles, c=c,
        final_idx=final_idx,
    )
    _, (v_xy_i, v_con_i, v_col_i, v_op_i) = jax.lax.scan(
        step, init, chunks, reverse=True
    )

    gid_flat = gauss_ids  # (I,) with sentinel c for invalid
    v_xys = jnp.zeros_like(xys).at[gid_flat].add(v_xy_i.reshape(I, 2), mode="drop")
    v_conics = jnp.zeros_like(conics).at[gid_flat].add(v_con_i.reshape(I, 3), mode="drop")
    v_colors = jnp.zeros_like(colors).at[gid_flat].add(
        v_col_i.reshape(I, colors.shape[-1]), mode="drop"
    )
    v_opac = jnp.zeros_like(opac).at[gid_flat].add(v_op_i.reshape(I), mode="drop")

    T_final_img = _tiles_to_image(T_final_state, tb_x, tb_y, height, width)
    v_bg = jnp.einsum("hw,hwc->c", T_final_img, v_img.astype(jnp.float32))
    return v_xys, v_conics, v_colors, v_opac, v_bg, None, None


_rasterize_binned.defvjp(_rasterize_binned_fwd, _rasterize_binned_bwd)


def rasterize_tiled(
    xys: jax.Array,
    conics: jax.Array,
    colors: jax.Array,
    opacities: jax.Array,
    depths: jax.Array,
    radii: jax.Array,
    num_tiles_hit: jax.Array,
    tile_min: jax.Array,
    tile_max: jax.Array,
    background: jax.Array,
    height: int,
    width: int,
    max_isects: int = 0,
    chunk_size: int = 256,
) -> Tuple[jax.Array, jax.Array]:
    """Tile-binned rasterization. Same semantics/gradients as rasterize().

    max_isects: static intersection budget (0 = 8x capacity). If the true
    count exceeds it the overflow tail is dropped — callers should size it
    from feedback (the training loop monitors bin_gaussians().n_isects).
    """
    from .projection import ProjectedGaussians

    opacities = opacities.reshape(-1)
    c = xys.shape[0]
    if max_isects <= 0:
        max_isects = 8 * c
    max_isects = ((max_isects + chunk_size - 1) // chunk_size) * chunk_size

    proj_like = ProjectedGaussians(
        xys=jax.lax.stop_gradient(xys),
        depths=depths,
        cam_depths=depths,
        radii=radii,
        conics=jax.lax.stop_gradient(conics),
        cov2d=jax.lax.stop_gradient(conics),
        num_tiles_hit=num_tiles_hit,
        tile_min=tile_min,
        tile_max=tile_max,
        mask=radii > 0,
    )
    binned = bin_gaussians(proj_like, height, width, max_isects)
    # invisible (radii == 0) slots never bin; opacity zeroing not required
    return _rasterize_binned(
        xys, conics, colors, opacities, background.astype(jnp.float32),
        binned.gauss_ids, binned.tile_ids, height, width, chunk_size,
    )
