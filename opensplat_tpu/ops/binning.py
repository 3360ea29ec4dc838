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
) -> BinnedGaussians:
    tb_x, tb_y = num_tiles(height, width)
    n_tiles = tb_x * tb_y
    c = proj.num_tiles_hit.shape[0]

    cum = jnp.cumsum(proj.num_tiles_hit)  # (C,)
    total = cum[-1]

    e = jnp.arange(max_isects, dtype=jnp.int32)
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

    tile_range = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_sorted, tile_range, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(tile_sorted, tile_range, side="right").astype(jnp.int32)

    return BinnedGaussians(
        gauss_ids=gid_sorted,
        tile_ids=tile_sorted,
        tile_start=tile_start,
        tile_end=tile_end,
        n_isects=total,
        valid=tile_sorted < n_tiles,
    )
