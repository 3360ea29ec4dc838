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
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainConfig
from ..models.gaussians import TrainState, grow_capacity, round_capacity
from ..optim.adam import means_lr_schedule
from ..train import (StepOutcome, Trainer, get_downscale_factor,
                     sh_degrees_for_step, train_step_impl)


def stack_states(states) -> TrainState:
    """Stack per-scene TrainStates (same capacity) along a new axis 0."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def unstack_states(stacked: TrainState, n: int):
    return [jax.tree.map(lambda x, i=i: x[i], stacked) for i in range(n)]


@partial(
    jax.jit,
    static_argnames=(
        "height", "width", "sh_deg", "cfg", "accumulate", "renderer",
        "isect_budget", "layout_budget", "grad_budget",
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
    grad_budget: int = 0,
):
    def one(state, c2w, fx_, fy_, cx_, cy_, gt):
        return train_step_impl(
            state, c2w, fx_, fy_, cx_, cy_, gt, means_lr,
            height, width, sh_deg, cfg, accumulate, renderer, isect_budget,
            layout_budget, grad_budget,
        )

    return jax.vmap(one)(states, cam_to_world, fx, fy, cx, cy, gt_images)


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "height", "width", "sh_deg", "cfg", "accumulate",
        "renderer", "isect_budget", "layout_budget", "grad_budget",
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
    grad_budget: int = 0,
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
                grad_budget,
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


class MultiSceneTrainer:
    """Production trainer for S independent scenes in one XLA program —
    the "one scene per chip" scaling axis (CLI: opensplat_tpu.multi_scene_cli).

    Composition: one child `Trainer` per scene supplies the reference-
    semantics host machinery (per-scene camera sampler with the
    reshuffle-per-epoch order, device-resident GT cache, refine/reset
    state machine, capacity growth) while the per-step compute runs as a
    single stacked program — `sharded_multi_scene_step` when a mesh is
    given (scene axis over `data`, each device running its own scenes'
    full binning+Pallas pipeline locally), else the vmapped
    `multi_scene_train_step`.

    Between refine boundaries the stacked state is the source of truth
    (no per-step restacking); at each boundary it is unstacked, every
    child refines exactly as a standalone run would (its own camera
    count feeds the reference's reset-interval guard, model.cpp:341),
    capacities are re-aligned to a common padded maximum, and the batch
    restacks.

    Constraint: all scenes must share image dimensions at equal
    downscale (same capture rig) — the batched program has one static
    (H, W).
    """

    def __init__(
        self,
        states: List[TrainState],
        cameras_per_scene: List[list],
        cfg: TrainConfig,
        renderer: str = "dense",
        mesh=None,
    ):
        assert len(states) == len(cameras_per_scene) and states
        self.cfg = cfg
        self.renderer = renderer
        self.mesh = mesh
        self.n_scenes = len(states)
        if mesh is not None:
            n_data = mesh.shape["data"]
            assert self.n_scenes % n_data == 0, (
                f"{self.n_scenes} scenes must divide the data axis "
                f"({n_data}) so every device holds the same scene count"
            )
        self.children = [
            Trainer(st, cams, cfg, renderer=renderer)
            for st, cams in zip(states, cameras_per_scene)
        ]
        self.refine_metrics = None
        self.last_hw = (0, 0)
        # shared budgets: one program serves all scenes, so expansion /
        # layout budgets track the fleet-max demand (Trainer's unbound
        # budget machinery reused over this object's own dict)
        self._isect_budgets: dict = {}
        self.overflow_events = 0
        self._pending_demand = jnp.zeros((3,), jnp.int32)
        self._align_and_stack([c.state for c in self.children])

    # reuse Trainer's budget bookkeeping verbatim
    _BUDGET_BUCKET = Trainer._BUDGET_BUCKET
    _BUDGET_MARGIN = Trainer._BUDGET_MARGIN
    _budget_for = Trainer._budget_for
    _update_budget = Trainer._update_budget
    _check_overflow = Trainer._check_overflow

    def _align_and_stack(self, states: List[TrainState]):
        cap = max(s.alive.shape[0] for s in states)
        cap = round_capacity(cap, self.cfg.capacity_round)
        states = [
            grow_capacity(s, cap) if s.alive.shape[0] != cap else s
            for s in states
        ]
        stacked = stack_states(states)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            stacked = jax.tree.map(
                lambda x: jax.device_put(
                    x,
                    NamedSharding(
                        self.mesh, P("data", *([None] * (x.ndim - 1)))
                    ),
                ),
                stacked,
            )
        self.state = stacked

    def _put_cam(self, arr, dtype=jnp.float32):
        arr = jnp.asarray(arr, dtype)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            arr = jax.device_put(
                arr,
                NamedSharding(self.mesh, P("data", *([None] * (arr.ndim - 1)))),
            )
        return arr

    def run_step(self, step: int) -> StepOutcome:
        cfg = self.cfg
        factor = get_downscale_factor(step, cfg)
        cams, gts = [], []
        for ch in self.children:
            idx = ch.sampler.next()
            cams.append(ch.cameras[idx])
            gts.append(ch._gt_on_device(idx, factor))
        shapes = {g.shape for g in gts}
        if len(shapes) != 1:
            raise ValueError(
                f"multi-scene batch needs equal image sizes at factor "
                f"{factor}, got {sorted(shapes)}"
            )
        h, w = gts[0].shape[0], gts[0].shape[1]
        if (h, w) != self.last_hw:
            self._pending_demand = jnp.zeros((3,), jnp.int32)
        self.last_hw = (h, w)
        sh_deg = sh_degrees_for_step(step, cfg)
        means_lr = means_lr_schedule(
            cfg.lr_means, cfg.lr_means_final, cfg.num_iters, step - 1
        )
        accumulate = step < cfg.stop_split_at

        step_args = (
            self.state,
            self._put_cam(np.stack([c.cam_to_world for c in cams])),
            self._put_cam(np.asarray([c.fx / factor for c in cams])),
            self._put_cam(np.asarray([c.fy / factor for c in cams])),
            self._put_cam(np.asarray([c.cx / factor for c in cams])),
            self._put_cam(np.asarray([c.cy / factor for c in cams])),
            self._put_cam(jnp.stack(gts)),
            means_lr,
        )
        kw = dict(
            height=h, width=w, sh_deg=sh_deg, cfg=cfg,
            accumulate=accumulate, renderer=self.renderer,
            isect_budget=self._budget_for(h, w)[0],
            layout_budget=self._budget_for(h, w)[1],
            grad_budget=self._budget_for(h, w)[2],
        )
        if self.mesh is not None:
            self.state, metrics = sharded_multi_scene_step(
                *step_args, mesh=self.mesh, **kw
            )
        else:
            self.state, metrics = multi_scene_train_step(*step_args, **kw)

        # fleet-max demand, folded device-side between host looks
        self._pending_demand = jnp.maximum(
            self._pending_demand, jnp.max(metrics["demand"], axis=0)
        )
        if step <= 3 or step % 10 == 0 or step % cfg.refine_every == 0:
            d = np.asarray(self._pending_demand)
            self._check_overflow(h, w, int(d[0]), int(d[1]), int(d[2]))
            self._pending_demand = jnp.zeros((3,), jnp.int32)

        if step % cfg.refine_every == 0 and step > cfg.warmup_length:
            self._refine(step)

        out = dict(metrics)
        out["loss"] = jnp.mean(metrics["loss"])
        out["psnr"] = jnp.mean(metrics["psnr"])
        out["n_alive"] = jnp.sum(metrics["n_alive"])
        out["loss_per_scene"] = metrics["loss"]
        return StepOutcome(out)

    def _refine(self, step: int):
        states = unstack_states(self.state, self.n_scenes)
        refine = []
        for ch, st in zip(self.children, states):
            ch.state = st
            ch.last_hw = self.last_hw
            ch._refine(step)  # per-scene camera count → reference guard
            refine.append(ch.refine_metrics)
        self.refine_metrics = (
            None if all(r is None for r in refine) else refine
        )
        self._align_and_stack([ch.state for ch in self.children])

    def scene_states(self) -> List[TrainState]:
        """Per-scene states (e.g. for saving each scene's PLY)."""
        return unstack_states(self.state, self.n_scenes)
