"""Tile/depth binning: expand Gaussians to (gaussian, tile) intersections,
sort by (tile, depth), and compute per-tile ranges.

Reference pipeline: map_gaussian_to_intersects (forward.cu:107-143) emits
64-bit keys (tile_id << 32) | depth_bits, a global radix sort orders them
(rasterize_gaussians.cpp:25), get_tile_bin_edges finds per-tile ranges
(forward.cu:148-169).

TPU re-design (no int64 needed, no scatter):
  * the variable-length intersection list becomes a fixed budget
    MAX_ISECTS; entry e finds its source Gaussian with a searchsorted
    over the cumulative tile counts (a gather, not a scatter);
  * the sort is one lexicographic jax.lax.sort over (tile_id,
    depth_bits, gaussian_id) with num_keys=2 — depth_bits is the
    float32 bit pattern, monotone for positive camera-space depths
    (the reference uses the same bit trick, forward.cu:132-137);
  * per-tile [start, end) ranges come from two searchsorteds.

Overflow: if the true intersection count exceeds the budget, the tail
(highest Gaussian indices) is dropped; `n_isects` is returned so the host
can detect this and re-run with a larger bucket (never silent).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import BLOCK_X, BLOCK_Y, ProjectedGaussians


class BinnedGaussians(NamedTuple):
    gauss_ids: jax.Array  # (I,) int32 sorted by (tile, depth); C = invalid
    tile_ids: jax.Array  # (I,) int32; num_tiles = invalid
    tile_start: jax.Array  # (T,) int32
    tile_end: jax.Array  # (T,) int32
    n_isects: jax.Array  # () int32 true intersection count (may exceed I)
    valid: jax.Array  # (I,) bool


def num_tiles(height: int, width: int):
    return (
        (width + BLOCK_X - 1) // BLOCK_X,
        (height + BLOCK_Y - 1) // BLOCK_Y,
    )


def bin_gaussians(
    proj: ProjectedGaussians,
    height: int,
    width: int,
    max_isects: int,
    align: int = 1,
) -> BinnedGaussians:
    """align > 1 pads every tile's range to a multiple of `align` entries
    (gid sentinel = C for padding) so the Pallas kernel can DMA
    lane-aligned chunks; tile_end still marks the true end of real
    entries. n_isects reports the total INCLUDING alignment padding so
    budget feedback accounts for it."""
    tb_x, tb_y = num_tiles(height, width)
    n_tiles = tb_x * tb_y
    c = proj.num_tiles_hit.shape[0]

    cum = jnp.cumsum(proj.num_tiles_hit)  # (C,)
    total = cum[-1]

    # optimization_barrier: XLA otherwise constant-folds the iota into the
    # searchsorted and picks a ~2000x slower lowering (measured on v5e)
    e = jax.lax.optimization_barrier(jnp.arange(max_isects, dtype=jnp.int32))
    g = jnp.searchsorted(cum, e, side="right").astype(jnp.int32)
    in_range = e < total
    g_safe = jnp.minimum(g, c - 1)
    start = cum[g_safe] - proj.num_tiles_hit[g_safe]
    off = e - start
    bw = jnp.maximum(proj.tile_max[g_safe, 0] - proj.tile_min[g_safe, 0], 1)
    tx = proj.tile_min[g_safe, 0] + off % bw
    ty = proj.tile_min[g_safe, 1] + off // bw
    tile_id = jnp.where(in_range, ty * tb_x + tx, n_tiles).astype(jnp.int32)

    depth_bits = jax.lax.bitcast_convert_type(
        proj.depths[g_safe].astype(jnp.float32), jnp.int32
    )
    depth_bits = jnp.where(in_range, depth_bits, jnp.iinfo(jnp.int32).max)
    gid = jnp.where(in_range, g_safe, c)

    tile_sorted, _, gid_sorted = jax.lax.sort(
        (tile_id, depth_bits, gid), num_keys=2, is_stable=True
    )

    tile_range = jax.lax.optimization_barrier(jnp.arange(n_tiles, dtype=jnp.int32))
    tile_start = jnp.searchsorted(tile_sorted, tile_range, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(tile_sorted, tile_range, side="right").astype(jnp.int32)

    if align == 1:
        return BinnedGaussians(
            gauss_ids=gid_sorted,
            tile_ids=tile_sorted,
            tile_start=tile_start,
            tile_end=tile_end,
            n_isects=total,
            valid=tile_sorted < n_tiles,
        )

    # re-layout with per-tile alignment padding
    counts = tile_end - tile_start  # (T,)
    padded = ((counts + align - 1) // align) * align
    pcum = jnp.cumsum(padded)
    padded_start = (pcum - padded).astype(jnp.int32)
    padded_total = pcum[-1]

    pos_in_tile = e - tile_start[jnp.minimum(tile_sorted, n_tiles - 1)]
    new_pos = jnp.where(
        tile_sorted < n_tiles,
        padded_start[jnp.minimum(tile_sorted, n_tiles - 1)] + pos_in_tile,
        max_isects,  # dropped
    )
    gid_padded = jnp.full((max_isects,), c, jnp.int32).at[new_pos].set(
        gid_sorted, mode="drop"
    )
    # padded slots keep their tile id so the stream stays tile-contiguous
    slot_tile = jnp.searchsorted(pcum, e, side="right").astype(jnp.int32)
    tile_padded = jnp.where(e < padded_total, slot_tile, n_tiles)

    # clamp ranges into the budget (overflow tail is dropped, n_isects
    # still reports the true padded total for host feedback)
    start_cl = jnp.minimum(padded_start, max_isects).astype(jnp.int32)
    end_cl = jnp.minimum(padded_start + counts, max_isects).astype(jnp.int32)

    return BinnedGaussians(
        gauss_ids=gid_padded,
        tile_ids=tile_padded,
        tile_start=start_cl,
        tile_end=end_cl,
        n_isects=padded_total,
        valid=gid_padded < c,
    )
