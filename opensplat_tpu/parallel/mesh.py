"""Device mesh + sharding helpers (GSPMD/pjit — the scaling layer the
reference lacks entirely; README.md:268 lists multi-machine as an open
goal).

Axes:
  data  — camera data-parallelism: each device renders different cameras
          of the same scene; parameter gradients are all-reduced by XLA.
  model — Gaussian-set sharding: the capacity axis is split across
          devices (projection/SH are embarrassingly parallel over N;
          the rasterizer gathers the frustum-visible subset).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (n_data, n_model, len(devices))
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, params, axis: str = "model"):
    """Shard every (C, ...) parameter leaf along the capacity axis."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        if x.ndim >= 1:
            return jax.device_put(x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))))
        return jax.device_put(x, replicate(mesh))

    return jax.tree.map(put, params)
