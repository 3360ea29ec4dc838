"""Gaussian parameter set on a fixed capacity with an alive mask.

The reference stores six learnable tensors that are re-allocated on every
densify/cull (model.hpp:81-86, model.cpp:387-392,446-451). Under jit that
would recompile every 100 steps, so we keep a static capacity C >= alive
count; dead rows are frozen by the masked Adam and excluded from
rendering by the alive mask. Densify/cull become masked scatters into
free slots (see densify.py); capacity grows host-side in coarse buckets
when needed (bounded recompiles).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from scipy.spatial import cKDTree

from ..ops.sh import num_sh_bases, rgb_to_sh
from ..ops.tensor_math import random_quat
from ..optim.adam import AdamState, adam_init


@struct.dataclass
class GaussianParams:
    means: jax.Array  # (C, 3)
    scales: jax.Array  # (C, 3) log-scales
    quats: jax.Array  # (C, 4) wxyz
    features_dc: jax.Array  # (C, 3) SH degree-0 coefficients
    features_rest: jax.Array  # (C, B-1, 3) higher SH coefficients
    opacities: jax.Array  # (C, 1) logits


@struct.dataclass
class DensifyStats:
    xys_grad_norm: jax.Array  # (C,)
    vis_counts: jax.Array  # (C,)
    max_2d_size: jax.Array  # (C,)
    initialized: jax.Array  # () bool


@struct.dataclass
class TrainState:
    params: GaussianParams
    alive: jax.Array  # (C,) bool
    opt: AdamState
    stats: DensifyStats
    key: jax.Array  # PRNG key for split sampling


def zero_stats(capacity: int) -> DensifyStats:
    z = jnp.zeros((capacity,), jnp.float32)
    return DensifyStats(
        xys_grad_norm=z, vis_counts=z, max_2d_size=z, initialized=jnp.zeros((), bool)
    )


def knn_mean_scale(points: np.ndarray) -> np.ndarray:
    """Initial per-point scale: mean distance of the 3 nearest neighbors
    (kdtree_tensor.cpp:4-23; scipy cKDTree stands in for nanoflann)."""
    tree = cKDTree(points)
    d, _ = tree.query(points, k=4)  # d[:, 0] == 0 (self)
    return d[:, 1:].mean(axis=1).astype(np.float32)


def round_capacity(n: int, rounding: int = 4096) -> int:
    return max(rounding, ((n + rounding - 1) // rounding) * rounding)


def init_model(
    points_xyz: np.ndarray,
    points_rgb: np.ndarray,
    sh_degree: int,
    capacity: Optional[int] = None,
    capacity_mult: float = 1.5,
    capacity_round: int = 4096,
    seed: int = 42,
) -> TrainState:
    """Build the initial TrainState from SfM points (model.hpp:34-56).

    points_rgb: (N, 3) uint8. Initialization matches the reference:
      means = points; scales = log(knn mean distance) replicated x3;
      quats random unit; SH0 = rgb2sh(rgb/255); opacity = logit(0.1).
    """
    n = points_xyz.shape[0]
    if capacity is None:
        capacity = round_capacity(int(n * capacity_mult), capacity_round)
    assert capacity >= n, f"capacity {capacity} < point count {n}"
    # Morton-order the points: spatially-nearby Gaussians become
    # memory-adjacent, making per-isect record gathers index-coherent
    # (~2x faster on v5e, PERF.md). Pure storage permutation — the
    # particle set is order-free.
    from ..ops.tensor_math import morton_order

    perm = morton_order(points_xyz)
    points_xyz = points_xyz[perm]
    points_rgb = points_rgb[perm]
    c = capacity
    dim_sh = num_sh_bases(sh_degree)

    key = jax.random.PRNGKey(seed)
    key, kq = jax.random.split(key)

    means = np.zeros((c, 3), np.float32)
    means[:n] = points_xyz.astype(np.float32)

    scales = np.zeros((c, 3), np.float32)
    knn = np.log(np.maximum(knn_mean_scale(points_xyz), 1e-10))
    scales[:n] = knn[:, None]

    quats = np.zeros((c, 4), np.float32)
    quats[:, 0] = 1.0  # keep dead rows valid rotations
    quats[:n] = np.asarray(random_quat(kq, n))

    f_dc = np.zeros((c, 3), np.float32)
    f_dc[:n] = np.asarray(
        rgb_to_sh(points_rgb.astype(np.float64) / 255.0), dtype=np.float32
    )
    f_rest = np.zeros((c, dim_sh - 1, 3), np.float32)

    opac = np.zeros((c, 1), np.float32)
    opac[:n] = float(np.log(0.1 / 0.9))  # logit(0.1), model.hpp:52

    alive = np.zeros((c,), bool)
    alive[:n] = True

    params = GaussianParams(
        means=jnp.asarray(means),
        scales=jnp.asarray(scales),
        quats=jnp.asarray(quats),
        features_dc=jnp.asarray(f_dc),
        features_rest=jnp.asarray(f_rest),
        opacities=jnp.asarray(opac),
    )
    return TrainState(
        params=params,
        alive=jnp.asarray(alive),
        opt=adam_init(params),
        stats=zero_stats(c),
        key=key,
    )


def grow_capacity(state: TrainState, new_capacity: int) -> TrainState:
    """Re-pad every (C, ...) array to a larger capacity (host-side)."""
    old_c = state.alive.shape[0]
    assert new_capacity > old_c

    def pad(x):
        if x.ndim == 0 or x.shape[0] != old_c:
            return x
        widths = [(0, new_capacity - old_c)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    params = jax.tree.map(pad, state.params)
    # keep padded quats valid unit rotations
    quats = params.quats.at[old_c:, 0].set(1.0)
    params = params.replace(quats=quats)
    return TrainState(
        params=params,
        alive=pad(state.alive),
        opt=AdamState(
            mu=jax.tree.map(pad, state.opt.mu),
            nu=jax.tree.map(pad, state.opt.nu),
            count=state.opt.count,
        ),
        stats=DensifyStats(
            xys_grad_norm=pad(state.stats.xys_grad_norm),
            vis_counts=pad(state.stats.vis_counts),
            max_2d_size=pad(state.stats.max_2d_size),
            initialized=state.stats.initialized,
        ),
        key=state.key,
    )
