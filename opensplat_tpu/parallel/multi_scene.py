"""Multi-scene batched training: S independent scenes advance one step
each in a single XLA program — "one scene per chip" scaling
(BASELINE.md targets; the reference is strictly single-scene).

Every TrainState leaf gains a leading scene axis (same capacity across
scenes); sharding that axis over the mesh's `data` axis places each
scene's parameters, optimizer state, and render on its own device with
no cross-device communication (scenes are independent).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.gaussians import TrainState
from ..train import train_step_impl


def stack_states(states) -> TrainState:
    """Stack per-scene TrainStates (same capacity) along a new axis 0."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def unstack_states(stacked: TrainState, n: int):
    return [jax.tree.map(lambda x, i=i: x[i], stacked) for i in range(n)]


@partial(
    jax.jit,
    static_argnames=(
        "height", "width", "sh_deg", "cfg", "accumulate", "renderer",
        "isect_budget", "layout_budget",
    ),
)
def multi_scene_train_step(
    states: TrainState,  # every leaf has leading scene axis S
    cam_to_world: jax.Array,  # (S, 4, 4) — one camera per scene this step
    fx: jax.Array,  # (S,)
    fy: jax.Array,
    cx: jax.Array,
    cy: jax.Array,
    gt_images: jax.Array,  # (S, H, W, 3)
    means_lr,
    height: int,
    width: int,
    sh_deg: int,
    cfg,
    accumulate: bool,
    renderer: str = "dense",
    isect_budget: int = 0,
    layout_budget: int = 0,
):
    def one(state, c2w, fx_, fy_, cx_, cy_, gt):
        return train_step_impl(
            state, c2w, fx_, fy_, cx_, cy_, gt, means_lr,
            height, width, sh_deg, cfg, accumulate, renderer, isect_budget,
            layout_budget,
        )

    return jax.vmap(one)(states, cam_to_world, fx, fy, cx, cy, gt_images)


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "height", "width", "sh_deg", "cfg", "accumulate",
        "renderer", "isect_budget", "layout_budget",
    ),
)
def sharded_multi_scene_step(
    states: TrainState,  # leading scene axis S = mesh n_data * d_local
    cam_to_world: jax.Array,
    fx: jax.Array,
    fy: jax.Array,
    cx: jax.Array,
    cy: jax.Array,
    gt_images: jax.Array,
    means_lr,
    mesh,
    height: int,
    width: int,
    sh_deg: int,
    cfg,
    accumulate: bool,
    renderer: str = "dense",
    isect_budget: int = 0,
    layout_budget: int = 0,
):
    """multi_scene_train_step under shard_map: the scene axis is sharded
    over the mesh's `data` axis and each device runs its own scenes'
    full (binning + Pallas) pipeline locally. Scenes are independent, so
    the body has NO collectives — the point of the shard_map wrapper is
    that GSPMD cannot partition a vmapped Pallas custom call along its
    batch axis (it would replicate the kernel on every device), while
    per-device unbatched-or-locally-vmapped calls scale perfectly
    (same reasoning as dp_trainer.py)."""
    from jax.sharding import PartitionSpec as P

    def body(st, c2w, fx_, fy_, cx_, cy_, gt):
        def one(s, c, f1, f2, c1, c2, g):
            return train_step_impl(
                s, c, f1, f2, c1, c2, g, means_lr, height, width, sh_deg,
                cfg, accumulate, renderer, isect_budget, layout_budget,
            )

        return jax.vmap(one)(st, c2w, fx_, fy_, cx_, cy_, gt)

    cam = P("data")
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(cam,) * 7,
        out_specs=(cam, cam),
        check_vma=False,
    )(states, cam_to_world, fx, fy, cx, cy, gt_images)
