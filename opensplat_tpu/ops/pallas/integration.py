"""rasterize_pallas: drop-in replacement for rasterize_tiled backed by the
Pallas TPU kernels (same binning, same semantics, same gradients)."""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..binning import bin_gaussians, num_tiles
from ..projection import ProjectedGaussians
from ..rasterize_tiled import _image_to_tiles, _tiles_to_image
from .raster import (COLOR_SCALE, K, PIX, compact_grad_layout,
                     pallas_rasterize_backward, pallas_rasterize_forward,
                     unpack_bf16_pair)

_GID_BIAS = float(2 ** 23)  # gid rides as the f32 VALUE 2^23 + gid:
# exact for ids < 2^23 and never a denormal bit pattern (raw small ints
# bitcast to f32 are denormals, which XLA flushes in data movement)


def _pack_planes(xys, conics, colors, opac, gauss_ids, c):
    """Gather per-isect Gaussian data into (8, I) packed field planes.

    v5e row-gathers have a fast path for rows of <= 32 bytes: one (C, 8)
    row gather runs ~7x faster than eight 1-column gathers and ~4x faster
    than a (C, 16) row gather (measured at 4M isects). The 9 per-Gaussian
    fields fit one 8-wide table by packing rgb as 3x10-bit fixed point
    (range [0, 4], step 1/256 — a ~57 dB ceiling, far above scene PSNR)
    bitcast into a single f32 plane; the kernel unpacks with shifts.
    Row 7 carries 2^23 + gid so the backward's compacted gradient stream
    is self-describing (sentinel ids clamp to c-1; they only ever pair
    with zero gradients).
    """
    g = jnp.minimum(gauss_ids, c - 1)
    q = jnp.clip(jnp.round(colors * COLOR_SCALE), 0.0, 1023.0).astype(jnp.int32)
    packed_bits = (q[:, 0] << 20) | (q[:, 1] << 10) | q[:, 2]
    packed_f = jax.lax.bitcast_convert_type(packed_bits, jnp.float32)
    table8 = jnp.concatenate(
        [xys, conics, opac[:, None], packed_f[:, None],
         (jnp.arange(c, dtype=jnp.int32)[:, None] + _GID_BIAS
          ).astype(jnp.float32)],
        axis=1,
    )  # (C, 8): x, y, A, B, C, opac, rgb_packed, 2^23+gid
    return table8[g].T  # (8, I)


# backward reduction strategy switch: streams at or above this isect
# count use the payload-sort segment sum, below it the fused scatter-add
# (see _rasterize_pallas_bwd). With the 6-operand packed sort the sort
# path measured faster at EVERY size on v5e (16k@256: 163 -> 182
# steps/s, 131k@512: 23.8 -> 29.9), so the default is "always sort";
# the scatter path stays selectable for tests and other backends.
SEGSUM_SORT_THRESHOLD = int(
    __import__("os").environ.get("OPENSPLAT_TPU_SEGSUM_THRESHOLD", 0)
)

# sorted-stream reduction backend: the Pallas streaming one-hot-matmul
# segment sum (segsum.py) by default; OPENSPLAT_TPU_SEGSUM_KERNEL=0
# falls back to the XLA multi-pass cumsum + boundary-gather scheme.
SEGSUM_PALLAS = (
    __import__("os").environ.get("OPENSPLAT_TPU_SEGSUM_KERNEL", "1") != "0"
)

# exact tile-ellipse culling pays for its 6 extra stream cumsums only on
# large candidate streams (measured v5e: -1.5% at ~0.8M, +20% at ~8.5M);
# below this candidate budget binning skips the cull. Module-level so
# tests can force either path.
CULL_MIN_CANDIDATES = 2_000_000


def _interpret() -> bool:
    import jax as _jax

    return _jax.default_backend() != "tpu"


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _rasterize_pallas_binned(xys, conics, colors, opac, background,
                             gauss_ids, bins, height, width, grad_isects):
    (img, final_t, n_grads), _ = _pallas_fwd_impl(
        xys, conics, colors, opac, background, gauss_ids, bins, height, width
    )
    return img, final_t, n_grads


def _pallas_fwd_impl(xys, conics, colors, opac, background, gauss_ids, bins,
                     height, width):
    tile_start, tile_end = bins
    tb_x, tb_y = num_tiles(height, width)
    c = xys.shape[0]
    recs = _pack_planes(
        jax.lax.stop_gradient(xys),
        jax.lax.stop_gradient(conics),
        jax.lax.stop_gradient(colors),
        jax.lax.stop_gradient(opac),
        gauss_ids,
        c,
    )
    acc, fidx = pallas_rasterize_forward(
        recs, tile_start, tile_end, tb_x, tb_y, interpret=_interpret()
    )
    rgb_t = jnp.moveaxis(acc[:, 0:3, :], 1, 2)  # (T, 256, 3)
    T_t = acc[:, 3, :]  # (T, 256)
    out_t = rgb_t + T_t[..., None] * background[None, None, :]
    img = _tiles_to_image(out_t, tb_x, tb_y, height, width)
    final_t = _tiles_to_image(T_t, tb_x, tb_y, height, width)
    # compact gradient layout: per-tile bases + total (the grad-budget
    # demand the Trainer adapts to — reported even on forward-only runs)
    comp_start, n_grads = compact_grad_layout(tile_start, tile_end, fidx)
    return (img, final_t, n_grads), (recs, fidx, comp_start, T_t)


def _rasterize_pallas_fwd(xys, conics, colors, opac, background,
                          gauss_ids, bins, height, width, grad_isects):
    (img, final_t, n_grads), (recs, fidx, comp_start, T_t) = _pallas_fwd_impl(
        xys, conics, colors, opac, background, gauss_ids, bins, height, width
    )
    res = (opac, background, bins, recs, fidx, comp_start, T_t)
    return (img, final_t, n_grads), res


def _rasterize_pallas_bwd(height, width, grad_isects, res, cotangents):
    (opac, background, bins, recs, fidx, comp_start, T_t) = res
    tile_start, tile_end = bins
    v_img, v_ft, _ = cotangents  # n_grads cotangent is unused (int out)
    tb_x, tb_y = num_tiles(height, width)

    v_out_t = _image_to_tiles(v_img.astype(jnp.float32), tb_x, tb_y, height, width)
    v_oa_t = _image_to_tiles(v_ft.astype(jnp.float32), tb_x, tb_y, height, width)
    bg_dot_t = v_out_t @ background  # (T, 256)
    cot = jnp.concatenate(
        [
            jnp.moveaxis(v_out_t, 2, 1),  # (T, 3, 256)
            v_oa_t[:, None, :],
            T_t[:, None, :],
            bg_dot_t[:, None, :],
            jnp.zeros((tb_x * tb_y, 2, PIX), jnp.float32),
        ],
        axis=1,
    )
    grecs = pallas_rasterize_backward(
        recs, tile_start, tile_end, comp_start, cot, fidx, tb_x, tb_y,
        grad_n=grad_isects, interpret=_interpret(),
    )
    # gid per compacted row, from the self-describing gid value plane
    # (2^23 + gid; all-zero unwritten tail rows decode to a negative id
    # that every reduction below excludes)
    gid_rows = grecs[5].astype(jnp.int32) - jnp.int32(2 ** 23)

    # Per-Gaussian gradient reduction: gid payload sort + one-hot-matmul
    # segment sum by default (duplicate-index scatter-adds serialize on
    # v5e at every measured size); the fused (I, 9) scatter-add remains
    # selectable via SEGSUM_SORT_THRESHOLD. The stream is the COMPACT
    # gradient layout (~0.5x the layout budget on converging scenes), so
    # the sort runs on the early-termination prefix only.
    c = opac.shape[0]
    i = grad_isects

    def unpack5(p0, p1, p2, p3, p4):
        """5 packed gradient planes -> 9 f32 columns (see raster.py)."""
        v_x, v_y = unpack_bf16_pair(p0)
        v_A, v_B = unpack_bf16_pair(p1)
        v_C, v_op = unpack_bf16_pair(p2)
        v_r, v_g = unpack_bf16_pair(p3)
        return [v_x, v_y, v_A, v_B, v_C, v_op, v_r, v_g, p4]

    if i < SEGSUM_SORT_THRESHOLD:
        planes9 = jnp.stack(unpack5(*(grecs[k] for k in range(5))), axis=1)
        acc = jnp.zeros((c, 9), jnp.float32).at[gid_rows].add(
            planes9, mode="drop"
        )
    else:
        # Segment reduction with NO scatter and NO big searchsorted (on
        # v5e a duplicate-index scatter costs ~64ms PER COLUMN at 8.5M
        # rows, and an I-sized searchsorted is log(I) such gathers).
        # Carry the 5 packed gradient planes THROUGH the sort as
        # payload: the bitonic sort is bandwidth-bound per operand and
        # costs far less than the latency-bound (I, 8) row gather a
        # sort-indices-then-gather scheme needs (measured v5e 1M@1080:
        # +20% whole-step); bf16-pair packing keeps it to 6 operands.
        # Caveat: exact only when the stream did not overflow the budget
        # (overflow already degrades the forward identically and the
        # budget feedback regrows next step).
        out = jax.lax.sort(
            (gid_rows,) + tuple(grecs[k] for k in range(5)),
            num_keys=1, is_stable=False,
        )
        if SEGSUM_PALLAS:
            # one streaming pass: gaussian-block grid + one-hot matmul
            # (direct per-segment f32 sums — no multi-pass cumsum, no
            # boundary gathers, no cumsum-difference cancellation); the
            # compact stream's per-block windows come from one
            # block-count-sized searchsorted inside
            from .segsum import pallas_segment_sum

            acc = pallas_segment_sum(
                out[0], tuple(out[1:]), ends=None, n_gaussians=c,
                interpret=_interpret(),
            )
        else:
            # XLA fallback (test/debug path): per-Gaussian run ends via a
            # C-query searchsorted over the sorted ids (the compact
            # stream's per-Gaussian counts are not known a priori), then
            # the cumsum-difference scheme
            ends_g = jnp.searchsorted(
                out[0], jnp.arange(c, dtype=jnp.int32), side="right"
            ).astype(jnp.int32)
            cols9 = unpack5(*out[1:])
            cs8 = jnp.cumsum(jnp.stack(cols9[0:8], axis=1), axis=0)
            # (I, 8): vx, vy, vA, vB, vC, vopac, vr, vg
            cs1 = jnp.cumsum(cols9[8])  # v_b
            # gaussian g's run starts where g-1's ends; the stream's
            # leading negative-id rows (sorted zero-fill) carry all-zero
            # gradients, so gaussian 0's prefix needs no correction
            end8 = jnp.where(ends_g[:, None] > 0,
                             cs8[jnp.maximum(ends_g - 1, 0)], 0.0)
            end1 = jnp.where(ends_g > 0, cs1[jnp.maximum(ends_g - 1, 0)], 0.0)
            end9 = jnp.concatenate([end8, end1[:, None]], axis=1)
            start9 = jnp.concatenate(
                [jnp.zeros((1, 9), jnp.float32), end9[:-1]], axis=0
            )
            acc = end9 - start9
    v_xys = acc[:, 0:2]
    v_conics = acc[:, 2:5]
    v_opac = acc[:, 5].reshape(opac.shape)
    v_colors = acc[:, 6:9]

    T_final_img = _tiles_to_image(T_t, tb_x, tb_y, height, width)
    v_bg = jnp.einsum("hw,hwc->c", T_final_img, v_img.astype(jnp.float32))
    return v_xys, v_conics, v_colors, v_opac, v_bg, None, None


_rasterize_pallas_binned.defvjp(_rasterize_pallas_fwd, _rasterize_pallas_bwd)


def rasterize_pallas(
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
    layout_isects: int = 0,
    grad_isects: int = 0,
    return_isects: bool = False,
) -> Tuple[jax.Array, ...]:
    """Pallas TPU rasterization; rasterize_tiled() contract. With
    return_isects two outputs are appended: the kept isect total
    (layout-budget feedback) and the compact gradient-stream total
    (grad-budget feedback).

    Three static budgets: `max_isects` sizes the candidate expansion/sort
    stream (tile-bbox pairs, fed back from count_isects), `layout_isects`
    sizes the sorted-stream prefix every downstream per-isect stage runs
    at (fed back from the n_isects return; the culled tail sorts past
    every tile range), and `grad_isects` sizes the backward's COMPACT
    gradient stream (per-tile early-termination prefixes, fed back from
    the n_grads return; 0 defaults to layout_isects + a per-tile padding
    allowance, which cannot overflow). The exact tile-ellipse cull in
    binning typically drops 30-50% of bbox pairs with bit-identical
    output (see bin_gaussians)."""
    from ..rasterize import ALPHA_THRESH

    opacities = opacities.reshape(-1)
    c = xys.shape[0]
    if c >= 2 ** 23:
        raise ValueError(
            f"rasterize_pallas: capacity {c} >= 2^23 — the packed gradient "
            "records carry gid as the f32 value 2^23+gid, exact only below "
            "8388608 ids. Shard the Gaussian axis (parallel/gaussian_shard) "
            "so each device's visible table stays under 2^23."
        )
    tb_x, tb_y = num_tiles(height, width)
    floor_budget = max(8 * c, K)
    if max_isects <= 0:
        max_isects = floor_budget
    max_isects = ((max_isects + K - 1) // K) * K
    if layout_isects <= 0:
        layout_isects = max_isects
    layout_isects = ((layout_isects + K - 1) // K) * K
    layout_isects = max(min(layout_isects, max_isects), K)
    if grad_isects <= 0:
        # safe default: every tile's chunk count is at most
        # cdiv(count, K) + 1, so layout + 2K per tile can never overflow
        grad_isects = layout_isects + 2 * K * tb_x * tb_y
    grad_isects = max(((grad_isects + K - 1) // K) * K, K)

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
    from ..binning import USE_EXPAND_KERNEL

    # with the expansion kernel the cull's extra stream passes are gone
    # (it rides the same one-hot matmul), so culling pays at EVERY size;
    # the XLA fallback keeps the measured candidate-count gate
    kernel_ok = (
        USE_EXPAND_KERNEL and max_isects % 128 == 0 and max_isects < 2**24
    )
    use_cull = kernel_ok or max_isects >= CULL_MIN_CANDIDATES
    binned = bin_gaussians(
        proj_like, height, width, max_isects,
        opacities=jax.lax.stop_gradient(opacities) if use_cull else None,
        alpha_thresh=ALPHA_THRESH,
    )
    # the kernels need NO aligned relayout (they floor each tile's chunk
    # base to 128 and mask by range bounds), so every downstream
    # per-isect stage runs on a static PREFIX of the sorted stream:
    # culled/invalid entries sort to the tail, past every tile range
    gauss_ids = binned.gauss_ids[:layout_isects]
    tile_start = jnp.minimum(binned.tile_start, layout_isects)
    tile_end = jnp.minimum(binned.tile_end, layout_isects)
    img, final_t, n_grads = _rasterize_pallas_binned(
        xys, conics, colors, opacities, background.astype(jnp.float32),
        gauss_ids, (tile_start, tile_end), height, width, grad_isects,
    )
    if return_isects:
        return img, final_t, binned.n_isects, n_grads
    return img, final_t
