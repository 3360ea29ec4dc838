"""Tile/depth binning: expand Gaussians to (gaussian, tile) intersections,
sort by (tile, depth), and compute per-tile ranges.

Reference pipeline: map_gaussian_to_intersects (forward.cu:107-143) emits
64-bit keys (tile_id << 32) | depth_bits, a global radix sort orders them
(rasterize_gaussians.cpp:25), get_tile_bin_edges finds per-tile ranges
(forward.cu:148-169).

TPU re-design (no int64, no big gathers, no big searchsorteds):
  * the variable-length intersection list becomes a fixed budget
    MAX_ISECTS;
  * per-isect lookups of per-Gaussian values are NOT gathers — a 1M+-row
    dynamic gather costs 10-18 ms on v5e, and XLA lowers big
    searchsorteds to log(N) such gathers. Instead every per-Gaussian
    field is broadcast to its intersection segment with scatter-add of
    VALUE DELTAS at segment starts followed by one cumsum (telescoping
    is exact in int32) — ~50x faster, measured;
  * small per-Gaussian fields (tile bbox, width) are packed into one
    int32 so one cumsum pass broadcasts all three;
  * the sort is one lexicographic jax.lax.sort over (tile_id,
    depth_bits, gaussian_id) with num_keys=2 — depth_bits is the
    float32 bit pattern, monotone for positive camera-space depths
    (the reference uses the same bit trick, forward.cu:132-137);
  * per-tile [start, end) ranges come from two small searchsorteds
    (T queries, cheap: log(I) passes of T-element gathers);
  * the alignment re-layout finds each entry's position inside its tile
    run from run boundaries (neighbor comparison + cummax), again
    avoiding per-isect gathers.

Overflow: if the true intersection count exceeds the budget, the tail
(highest Gaussian indices) is dropped; `n_isects` is returned so the host
can detect this and re-run with a larger bucket (never silent).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import BLOCK_X, BLOCK_Y, ProjectedGaussians

# candidate expansion backend: the Pallas streaming kernel
# (pallas/expand.py: one-hot-matmul segmented broadcasts + in-kernel
# tile math/cull) by default; OPENSPLAT_TPU_EXPAND_KERNEL=0 falls back
# to the XLA delta-scatter+cumsum path below.
USE_EXPAND_KERNEL = (
    __import__("os").environ.get("OPENSPLAT_TPU_EXPAND_KERNEL", "1") != "0"
)


class BinnedGaussians(NamedTuple):
    gauss_ids: jax.Array  # (L,) int32 sorted by (tile, depth); C = invalid
    tile_ids: jax.Array  # (L,) int32; num_tiles = invalid
    tile_start: jax.Array  # (T,) int32
    tile_end: jax.Array  # (T,) int32
    n_isects: jax.Array  # () int32 true intersection count (may exceed L)
    valid: jax.Array  # (L,) bool
    isect_counts: jax.Array  # (C,) int32 per-Gaussian emitted-isect counts


def num_tiles(height: int, width: int):
    return (
        (width + BLOCK_X - 1) // BLOCK_X,
        (height + BLOCK_Y - 1) // BLOCK_Y,
    )


def _ffill_deltas(values: jax.Array, positions: jax.Array, size: int) -> jax.Array:
    """Broadcast per-segment `values` onto a length-`size` stream whose
    segment s starts at positions[s] (non-decreasing; empty segments share
    their start with the next segment — their deltas telescope away).
    Scatter value deltas at the starts, then cumsum. Exact for integers."""
    prev = jnp.concatenate([values[:1] * 0, values[:-1]])
    deltas = values - prev
    arr = jnp.zeros((size,), values.dtype).at[positions].add(deltas, mode="drop")
    return jnp.cumsum(arr)


def _ffill_f32(values: jax.Array, positions: jax.Array, size: int) -> jax.Array:
    """Segmented broadcast of float32 per-segment values: bitcast to int32
    (deltas telescope exactly in modular int32 arithmetic), delta-scatter +
    cumsum, bitcast back."""
    bits = jax.lax.bitcast_convert_type(values.astype(jnp.float32), jnp.int32)
    return jax.lax.bitcast_convert_type(
        _ffill_deltas(bits, positions, size), jnp.float32
    )


def _min_sigma_over_tile(mx, my, A, B, C, tx, ty, pos_slack: float = 0.0):
    """Conservative lower bound of the Gaussian exponent sigma(p) =
    0.5*(A dx^2 + C dy^2) + B dx dy (dx = mx - px, dy = my - py; the
    rasterizer's convention, forward.cu:340-342) over the tile's
    pixel-coordinate rectangle px in [tx*BX, tx*BX + BX-1], py likewise.
    Convex quadratic over a rectangle: zero if the mean lies inside,
    else the min over the four edges (each a clamped 1D quadratic).

    A, B, C may be bf16-rounded (delta <= 2^-8 relative): since
    |B dx dy| <= 0.5*(A dx^2 + C dy^2) for any PSD conic, the perturbed
    quadratic deviates from the true one by at most 2*delta*S where
    S = 0.5*(A dx^2 + C dy^2); the returned bound subtracts
    2.1*delta*S_corner (S maximized over the rect corners)."""
    # pos_slack expands the rectangle to absorb quantized mean
    # positions (conservative: a larger rect can only lower the min)
    dhi_x = mx - tx.astype(jnp.float32) * float(BLOCK_X) + pos_slack
    dlo_x = dhi_x - float(BLOCK_X - 1) - 2.0 * pos_slack
    dhi_y = my - ty.astype(jnp.float32) * float(BLOCK_Y) + pos_slack
    dlo_y = dhi_y - float(BLOCK_Y - 1) - 2.0 * pos_slack
    inside = (dlo_x <= 0.0) & (dhi_x >= 0.0) & (dlo_y <= 0.0) & (dhi_y >= 0.0)

    def q(dx, dy):
        return 0.5 * (A * dx * dx + C * dy * dy) + B * dx * dy

    def edge_x(xe):  # dx fixed at xe, minimize over dy
        dy = jnp.clip(-B * xe / jnp.maximum(C, 1e-12), dlo_y, dhi_y)
        return q(xe, dy)

    def edge_y(ye):
        dx = jnp.clip(-B * ye / jnp.maximum(A, 1e-12), dlo_x, dhi_x)
        return q(dx, ye)

    m = jnp.minimum(
        jnp.minimum(edge_x(dlo_x), edge_x(dhi_x)),
        jnp.minimum(edge_y(dlo_y), edge_y(dhi_y)),
    )
    s_corner = 0.5 * (
        A * jnp.maximum(dlo_x * dlo_x, dhi_x * dhi_x)
        + C * jnp.maximum(dlo_y * dlo_y, dhi_y * dhi_y)
    )
    delta = 2.0 ** -8
    return jnp.where(inside, 0.0, m - 2.1 * delta * s_corner)


def count_isects(
    proj: ProjectedGaussians, height: int, width: int, align: int = 1
):
    """(true_total, padded_total) intersection counts WITHOUT binning.

    O(C + T): per-tile histogram via 4-corner scatter + 2D integral image
    over tile rects (each Gaussian covers a tile rectangle). Used for
    adaptive budget feedback — unlike BinnedGaussians.n_isects it is exact
    even when the current budget already overflowed.

    align == 1 needs no histogram at all: the padded total equals
    sum(num_tiles_hit) (each Gaussian's bbox area), so the four C-row
    corner scatters (~9 ms each at 1M on v5e, serially chained) are
    skipped entirely.
    """
    total = jnp.sum(proj.num_tiles_hit)
    if align == 1:
        return total, total
    tb_x, tb_y = num_tiles(height, width)
    live = (proj.num_tiles_hit > 0).astype(jnp.int32)
    tmin, tmax = proj.tile_min, proj.tile_max
    grid = (
        jnp.zeros((tb_y + 1, tb_x + 1), jnp.int32)
        .at[tmin[:, 1], tmin[:, 0]].add(live)
        .at[tmin[:, 1], tmax[:, 0]].add(-live)
        .at[tmax[:, 1], tmin[:, 0]].add(-live)
        .at[tmax[:, 1], tmax[:, 0]].add(live)
    )
    hist = jnp.cumsum(jnp.cumsum(grid, axis=0), axis=1)[:tb_y, :tb_x]
    padded = ((hist + align - 1) // align) * align
    return total, jnp.sum(padded)


def bin_gaussians(
    proj: ProjectedGaussians,
    height: int,
    width: int,
    max_isects: int,
    align: int = 1,
    opacities: jax.Array | None = None,
    layout_size: int | None = None,
    alpha_thresh: float | None = None,
) -> BinnedGaussians:
    """align > 1 pads every tile's range to a multiple of `align` entries
    (gid sentinel = C for padding) so the Pallas kernel can DMA
    lane-aligned chunks; tile_end still marks the true end of real
    entries. n_isects reports the total INCLUDING alignment padding so
    budget feedback accounts for it.

    When `opacities` is given, (gaussian, tile) pairs whose maximum alpha
    anywhere in the tile provably stays below `alpha_thresh` are culled —
    the rasterizer would skip every one of their pixels anyway (the
    alpha >= 1/255 test, forward.cu:343-345), so the output is
    unchanged while the emitted stream shrinks ~30-50% vs the reference's
    tile-bbox binning (forward.cu:87-94 counts full bboxes). The cull
    test is the exact minimum of the Gaussian exponent over the tile
    rectangle (convex QP, closed form). `layout_size` then sizes the
    OUTPUT buffers separately from the candidate-expansion budget
    `max_isects`, so all downstream per-isect work runs at the culled
    size. isect_counts returns the per-Gaussian emitted counts (the
    culled replacement for num_tiles_hit in segment reductions)."""
    tb_x, tb_y = num_tiles(height, width)
    n_tiles = tb_x * tb_y
    c = proj.num_tiles_hit.shape[0]
    out_size = max_isects if layout_size is None else layout_size

    use_kernel = (
        USE_EXPAND_KERNEL
        and align == 1
        and layout_size is None
        and max_isects % 128 == 0
        and max_isects < 2**24
    )
    if use_kernel:
        import jax as _jax

        from .pallas.expand import pallas_expand_bin

        depth_bits_g = jax.lax.bitcast_convert_type(
            proj.depths.astype(jnp.float32), jnp.int32
        )
        if opacities is not None:
            s_max_g = jnp.log(
                jnp.maximum(opacities.reshape(-1).astype(jnp.float32), 1e-12)
                / alpha_thresh
            )
            tile_id, depth_bits, gid, isect_counts = pallas_expand_bin(
                proj.num_tiles_hit, proj.tile_min, proj.tile_max,
                depth_bits_g, height, width, max_isects,
                xys=jax.lax.stop_gradient(proj.xys),
                conics=jax.lax.stop_gradient(proj.conics),
                s_max=s_max_g, cull=True,
                interpret=_jax.default_backend() != "tpu",
            )
        else:
            tile_id, depth_bits, gid, _ = pallas_expand_bin(
                proj.num_tiles_hit, proj.tile_min, proj.tile_max,
                depth_bits_g, height, width, max_isects,
                interpret=_jax.default_backend() != "tpu",
            )
            isect_counts = proj.num_tiles_hit.astype(jnp.int32)

        # gid as a third sort key instead of is_stable: the candidate
        # stream is gaussian-major (gid non-decreasing), so stable tie
        # order within equal (tile, depth) IS ascending gid — identical
        # output, but without the iota operand XLA adds for stable sorts
        # (4 -> 3 sorted arrays, ~5 ms at 6.8M on v5e)
        tile_sorted, _, gid_sorted = jax.lax.sort(
            (tile_id, depth_bits, gid), num_keys=3, is_stable=False
        )
        tile_range = jax.lax.optimization_barrier(
            jnp.arange(n_tiles, dtype=jnp.int32)
        )
        tile_start = jnp.searchsorted(
            tile_sorted, tile_range, side="left"
        ).astype(jnp.int32)
        tile_end = jnp.searchsorted(
            tile_sorted, tile_range, side="right"
        ).astype(jnp.int32)
        return BinnedGaussians(
            gauss_ids=gid_sorted,
            tile_ids=tile_sorted,
            tile_start=tile_start,
            tile_end=tile_end,
            n_isects=(
                jnp.sum(proj.num_tiles_hit) if opacities is None
                else jnp.sum(isect_counts)
            ),
            valid=tile_sorted < n_tiles,
            isect_counts=isect_counts,
        )

    cnt = proj.num_tiles_hit
    cum = jnp.cumsum(cnt)  # (C,)
    total = cum[-1]
    starts = cum - cnt

    e = jnp.arange(max_isects, dtype=jnp.int32)
    in_range = e < total

    # segmented broadcast of per-Gaussian fields onto the isect stream
    gid_f = _ffill_deltas(jnp.arange(c, dtype=jnp.int32), starts, max_isects)
    start_f = _ffill_deltas(starts, starts, max_isects)
    # pack tile_min.x (10b), tile_min.y (10b), bbox width (11b) -> 31 bits
    bw_g = jnp.maximum(proj.tile_max[:, 0] - proj.tile_min[:, 0], 1)
    packed = (
        (proj.tile_min[:, 0] << 21) | (proj.tile_min[:, 1] << 11) | bw_g
    ).astype(jnp.int32)
    packed_f = _ffill_deltas(packed, starts, max_isects)
    depth_bits_g = jax.lax.bitcast_convert_type(
        proj.depths.astype(jnp.float32), jnp.int32
    )
    depth_f = _ffill_deltas(depth_bits_g, starts, max_isects)

    off = e - start_f
    bw = packed_f & 0x7FF
    tx = (packed_f >> 21) + off % bw
    ty = ((packed_f >> 11) & 0x3FF) + off // bw

    if opacities is not None:
        # exact tile-ellipse cull: keep only pairs that can reach
        # alpha_thresh somewhere in the tile (see docstring). Three
        # broadcast planes ride the candidate stream: (mx|my) quantized
        # to 0.25 px as an int16 pair (the rect min expands by the
        # 0.13 px quantization slack; saturated coordinates force keep),
        # and (A|C), (B|s_max) as bf16 pairs — _min_sigma_over_tile
        # compensates the bf16 rounding conservatively, and the final
        # margin absorbs the 0.4% rounding of s_max = ln(op/thresh).
        from .pallas.raster import pack_bf16_pair, unpack_bf16_pair

        s_max_g = jnp.log(
            jnp.maximum(opacities.reshape(-1).astype(jnp.float32), 1e-12)
            / alpha_thresh
        )

        def q16(v):
            return jnp.clip(
                jnp.round(v * 4.0), -32768, 32767
            ).astype(jnp.int32)

        mxy = _ffill_deltas(
            (q16(proj.xys[:, 0]) << 16) | (q16(proj.xys[:, 1]) & 0xFFFF),
            starts, max_isects,
        )
        ac = _ffill_f32(
            pack_bf16_pair(proj.conics[:, 0], proj.conics[:, 2]),
            starts, max_isects,
        )
        bs = _ffill_f32(
            pack_bf16_pair(proj.conics[:, 1], s_max_g), starts, max_isects
        )
        mxq = mxy >> 16  # arithmetic shift: sign preserved
        myq = (mxy << 16) >> 16
        saturated = (
            (mxq >= 32767) | (mxq <= -32768)
            | (myq >= 32767) | (myq <= -32768)
        )
        mx = mxq.astype(jnp.float32) * 0.25
        my = myq.astype(jnp.float32) * 0.25
        cA, cC = unpack_bf16_pair(ac)
        cB, s_max = unpack_bf16_pair(bs)
        min_sigma = _min_sigma_over_tile(
            mx, my, cA, cB, cC, tx, ty, pos_slack=0.13
        )
        # keep if op * exp(-min_sigma) could reach the threshold (the
        # 0.05 margin covers the bf16 rounding of s_max — conservative,
        # never drops a contributor)
        reachable = s_max - min_sigma >= -0.05
        keep = in_range & (reachable | saturated)
    else:
        keep = in_range

    tile_id = jnp.where(keep, ty * tb_x + tx, n_tiles).astype(jnp.int32)
    depth_bits = jnp.where(keep, depth_f, jnp.iinfo(jnp.int32).max)
    gid = jnp.where(keep, gid_f, c).astype(jnp.int32)

    if opacities is not None:
        # per-Gaussian emitted counts: the candidate stream is g-major
        # contiguous, so one cumsum of keep flags + two C-row boundary
        # gathers (no scatter, no searchsorted)
        kcum = jnp.cumsum(keep.astype(jnp.int32))
        def at(pos):
            p = jnp.minimum(pos, max_isects)
            return jnp.where(p > 0, kcum[jnp.maximum(p - 1, 0)], 0)
        isect_counts = (at(cum) - at(starts)).astype(jnp.int32)
    else:
        isect_counts = proj.num_tiles_hit.astype(jnp.int32)

    # gid as third key == stable order (stream is gid-major), minus the
    # stable-sort iota operand (see kernel path above)
    tile_sorted, _, gid_sorted = jax.lax.sort(
        (tile_id, depth_bits, gid), num_keys=3, is_stable=False
    )

    # T queries over the big sorted stream: cheap (log(I) passes of
    # T-element gathers)
    tile_range = jax.lax.optimization_barrier(jnp.arange(n_tiles, dtype=jnp.int32))
    tile_start = jnp.searchsorted(tile_sorted, tile_range, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(tile_sorted, tile_range, side="right").astype(jnp.int32)

    if align == 1 and layout_size is None:
        return BinnedGaussians(
            gauss_ids=gid_sorted,
            tile_ids=tile_sorted,
            tile_start=tile_start,
            tile_end=tile_end,
            n_isects=total if opacities is None else jnp.sum(isect_counts),
            valid=tile_sorted < n_tiles,
            isect_counts=isect_counts,
        )

    # re-layout with per-tile alignment padding
    counts = tile_end - tile_start  # (T,)
    padded = ((counts + align - 1) // align) * align
    pcum = jnp.cumsum(padded)
    padded_start = (pcum - padded).astype(jnp.int32)
    padded_total = pcum[-1]

    # position inside the current tile run from run boundaries (no gather)
    is_boundary = jnp.concatenate(
        [jnp.ones((1,), bool), tile_sorted[1:] != tile_sorted[:-1]]
    )
    run_start = jax.lax.cummax(jnp.where(is_boundary, e, -1))
    pos_in_tile = e - run_start
    # padded_start value of each entry's tile: scatter (monotone) at the
    # tiles' unpadded start positions, forward-fill with cummax
    padded_start_f = jax.lax.cummax(
        jnp.zeros((max_isects,), jnp.int32)
        .at[jnp.minimum(tile_start, max_isects)]
        .max(padded_start, mode="drop")
    )
    new_pos = jnp.where(
        tile_sorted < n_tiles,
        padded_start_f + pos_in_tile,
        out_size,  # dropped
    )
    # (an equivalent gather-based layout — slot j reads sorted entry
    # tile_start[t] + (j - padded_start[t]) — measured SLOWER on v5e:
    # the L-scale gather is latency-bound even with monotone indices,
    # while this scatter stays cheap below a few million rows)
    gid_padded = jnp.full((out_size,), c, jnp.int32).at[new_pos].set(
        gid_sorted, mode="drop"
    )
    # padded slots keep their tile id so the stream stays tile-contiguous:
    # scatter tile index at padded starts (monotone), forward-fill
    slot_tile = jax.lax.cummax(
        jnp.zeros((out_size,), jnp.int32)
        .at[jnp.minimum(padded_start, out_size)]
        .max(jnp.arange(n_tiles, dtype=jnp.int32), mode="drop")
    )
    e_out = jnp.arange(out_size, dtype=jnp.int32)
    tile_padded = jnp.where(e_out < padded_total, slot_tile, n_tiles)

    # clamp ranges into the budget (overflow tail is dropped, n_isects
    # still reports the true padded total for host feedback)
    start_cl = jnp.minimum(padded_start, out_size).astype(jnp.int32)
    end_cl = jnp.minimum(padded_start + counts, out_size).astype(jnp.int32)

    return BinnedGaussians(
        gauss_ids=gid_padded,
        tile_ids=tile_padded,
        tile_start=start_cl,
        tile_end=end_cl,
        n_isects=padded_total,
        valid=gid_padded < c,
        isect_counts=isect_counts,
    )
