"""Gaussian-sharded rendering/training: the capacity axis lives across
devices (SURVEY.md §7 phase 2) — for scenes too large for one chip's HBM
(BASELINE.md scaling row: 5M+ Gaussians sharded across hosts).

Design (shard_map over the 'model' axis; reference has no analogue —
README.md:268 lists distributed computation as an open goal):

  * every device OWNS a capacity shard (params, Adam state, densify
    stats all sharded P('model') — memory scales 1/M);
  * per camera, each device projects ITS shard (projection is
    embarrassingly parallel over N), frustum-culls, and mask-compacts
    the visible subset to a static budget V;
  * ONE all-gather along 'model' assembles the (M*V)-row visible set —
    the only forward collective, V rows per device instead of C/M;
  * each device rasterizes its own TILE-ROW BAND of the image against
    the gathered set (the band is just a sub-image: shift cy by the band
    offset and render band_h rows — projection, binning, and the Pallas
    kernels run unchanged on the smaller canvas). The image comes back
    sharded P('model') over rows;
  * backward: jax.grad through shard_map transposes the all-gather into
    a REDUCE-SCATTER of the gathered-set gradients (each owner receives
    the sum of all bands' contributions to its V rows), and the
    compaction gather into a V-scale scatter-add back into the shard —
    exactly the collective schedule SURVEY §7 calls for;
  * densify statistics stay shard-local: per-camera xys_shift gradients
    ride the same transpose chain home to the owner shard.

The loss is computed OUTSIDE the shard_map on the row-sharded image, so
SSIM's 11x11 window crosses band boundaries through GSPMD halo
exchanges rather than band-local approximations.
"""
from __future__ import annotations

import math
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TrainConfig
from ..models.densify import accumulate_stats
from ..models.gaussians import (
    GaussianParams,
    TrainState,
    grow_capacity,
    round_capacity,
)
from ..models.splat_model import DEFAULT_BACKGROUND, render_forward
from ..ops.projection import project_gaussians
from ..ops.camera import camera_matrices
from ..ops.ssim import main_loss, psnr
from ..optim.adam import adam_update, means_lr_schedule
from ..train import (
    StepOutcome,
    Trainer,
    get_downscale_factor,
    sh_degrees_for_step,
)
from .mesh import make_mesh


def shard_state(mesh: Mesh, state: TrainState) -> TrainState:
    """Place every capacity-axis leaf of the TrainState on P('model')."""
    cap_sharding = NamedSharding(mesh, P("model"))
    rep = NamedSharding(mesh, P())
    c = state.alive.shape[0]

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == c:
            return jax.device_put(x, cap_sharding)
        return jax.device_put(x, rep)

    return jax.tree.map(put, state)


def band_height(height: int, n_model: int) -> int:
    """Rows per device band, tile-aligned and padded so n_model bands
    cover any image height (the render canvas is n_model * band_height
    rows; rows >= height are cropped after reassembly — tiles are
    independent, so the cropped region is bit-identical to an unpadded
    render and the pad tiles get zero loss cotangent)."""
    return 16 * ((height + 16 * n_model - 1) // (16 * n_model))


def _gs_render_core(
    params_shard: GaussianParams,
    alive_shard: jax.Array,
    xys_shift_shard: jax.Array,
    cam_to_world, fx, fy, cx, cy,
    height: int, width: int, sh_deg: int, background,
    v_budget: int, renderer: str,
    isect_budget: int, layout_budget: int, grad_budget: int, n_model: int,
):
    """shard_map body: compact-gather-render one band. Returns
    (band_rgb, radii_shard, n_visible_shard, demand (3,) int32
    [n_cands, n_isects, n_grads])."""
    m = jax.lax.axis_index("model")
    band_h = band_height(height, n_model)

    # frustum visibility of MY shard against the FULL frame (projection
    # is elementwise over N; rerunning it for the gathered set later
    # costs V*M rows, not C)
    viewmat, projmat, _ = camera_matrices(cam_to_world, fx, fy, width, height)
    qn = params_shard.quats / jnp.linalg.norm(
        params_shard.quats, axis=-1, keepdims=True
    )
    proj = project_gaussians(
        params_shard.means, jnp.exp(params_shard.scales), 1.0,
        qn, viewmat, projmat, fx, fy, cx, cy,
        height, width, valid_mask=alive_shard,
    )
    visible = proj.mask & alive_shard
    n_visible = jnp.sum(visible)

    # mask-compact the visible subset to the static budget V
    # (argsort of ~visible is a stable partition: visible rows first)
    order = jnp.argsort(~visible)
    idx = order[:v_budget]
    sub_alive = jnp.take(visible, idx) & (
        jnp.arange(v_budget) < n_visible
    )

    def take(x):
        return jnp.take(x, idx, axis=0)

    sub = jax.tree.map(take, params_shard)
    sub_shift = jnp.take(xys_shift_shard, idx, axis=0)

    # THE forward collective: gather everyone's visible subsets
    def ag(x):
        return jax.lax.all_gather(x, "model", axis=0, tiled=True)

    g_params = jax.tree.map(ag, sub)
    g_alive = ag(sub_alive)
    g_shift = ag(sub_shift)

    out = render_forward(
        g_params, g_alive, cam_to_world, fx, fy,
        cx, cy - (m * band_h).astype(jnp.float32),
        band_h, width, sh_deg, background,
        xys_shift=g_shift, renderer=renderer,
        isect_budget=isect_budget, layout_budget=layout_budget,
        grad_budget=grad_budget,
        fov_height=height,
    )
    # densify-stat radii come from the FULL-FRAME visibility projection
    # above — for my shard's rows it is bit-identical to the replicated
    # path's proj.radii (same inputs, same math, true image height), so
    # no band pmax / scatter-home collective is needed at all
    demand = jax.lax.pmax(
        jnp.stack(
            [out.n_cands.astype(jnp.int32), out.n_isects.astype(jnp.int32),
             out.n_grads.astype(jnp.int32)]
        ),
        "model",
    )
    return out.rgb, proj.radii, n_visible, demand


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "height", "width", "sh_deg", "v_budget", "renderer",
        "isect_budget", "layout_budget",
    ),
)
def gs_render(
    state: TrainState,
    cam_to_world, fx, fy, cx, cy,
    mesh: Mesh,
    height: int, width: int, sh_deg: int,
    v_budget: int, renderer: str = "dense",
    isect_budget: int = 0, layout_budget: int = 0,
):
    """Inference render with the capacity axis sharded over 'model'.
    Returns (rgb (H, W, 3) row-sharded, max visible count per shard,
    demand (3,) int32 = max [n_cands, n_isects, n_grads] over the
    bands)."""
    n_model = mesh.shape["model"]
    background = jnp.asarray(DEFAULT_BACKGROUND, jnp.float32)
    capacity = state.alive.shape[0]

    def body(params, alive, c2w, fx_, fy_, cx_, cy_):
        rgb, _, n_vis, demand = _gs_render_core(
            params, alive, jnp.zeros((capacity // n_model, 2), jnp.float32),
            c2w, fx_, fy_, cx_, cy_, height, width, sh_deg,
            background, v_budget, renderer, isect_budget, layout_budget,
            0, n_model,
        )
        return rgb, jax.lax.pmax(n_vis, "model"), demand

    rgb, n_vis, demand = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("model"), P("model"), P(), P(), P(), P(), P()),
        out_specs=(P("model"), P(), P()),
        check_vma=False,
    )(
        state.params, state.alive,
        jnp.asarray(cam_to_world, jnp.float32),
        jnp.asarray(fx, jnp.float32), jnp.asarray(fy, jnp.float32),
        jnp.asarray(cx, jnp.float32), jnp.asarray(cy, jnp.float32),
    )
    return rgb[:height], n_vis, demand


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "height", "width", "sh_deg", "cfg", "accumulate",
        "v_budget", "renderer", "isect_budget", "layout_budget",
        "grad_budget",
    ),
)
def gs_train_step(
    state: TrainState,
    cam_to_world, fx, fy, cx, cy,
    gt_image: jax.Array,
    means_lr,
    mesh: Mesh,
    height: int, width: int, sh_deg: int,
    cfg: TrainConfig,
    accumulate: bool,
    v_budget: int,
    renderer: str = "dense",
    isect_budget: int = 0,
    layout_budget: int = 0,
    grad_budget: int = 0,
    pending_demand=None,
) -> Tuple[TrainState, dict]:
    """One training step on Gaussian-sharded state: forward all-gather of
    frustum-compacted subsets, banded rasterization, reduce-scatter of
    gradients back to the owner shards (via the shard_map transpose),
    shard-local Adam + densify statistics.

    metrics["demand"] is a (4,) int32 [n_cands, n_isects, n_grads,
    max_shard_visible] running max (folded with `pending_demand`) — the
    host budget feedback for the isect budgets AND the visible-subset
    budget, so v_budget truncation between sync points is never silent
    either (SURVEY.md §7 hard-part 3)."""
    n_model = mesh.shape["model"]
    background = jnp.asarray(DEFAULT_BACKGROUND, jnp.float32)
    capacity = state.alive.shape[0]
    shard_c = capacity // n_model

    def band_body(params, alive, shifts, c2w, fx_, fy_, cx_, cy_):
        rgb, radii, n_vis, demand = _gs_render_core(
            params, alive, shifts, c2w, fx_, fy_, cx_, cy_,
            height=height, width=width, sh_deg=sh_deg,
            background=background, v_budget=v_budget, renderer=renderer,
            isect_budget=isect_budget, layout_budget=layout_budget,
            grad_budget=grad_budget, n_model=n_model,
        )
        return rgb, radii, jax.lax.pmax(n_vis, "model"), demand

    render_band = jax.shard_map(
        band_body,
        mesh=mesh,
        in_specs=(
            P("model"), P("model"), P("model"),
            P(), P(), P(), P(), P(),
        ),
        out_specs=(P("model"), P("model"), P(), P()),
        check_vma=False,
    )

    def loss_fn(params, xys_shift):
        rgb, radii, n_vis, demand = render_band(
            params, state.alive, xys_shift,
            jnp.asarray(cam_to_world, jnp.float32),
            jnp.asarray(fx, jnp.float32), jnp.asarray(fy, jnp.float32),
            jnp.asarray(cx, jnp.float32), jnp.asarray(cy, jnp.float32),
        )
        # crop the band padding (tiles are independent: rows [0, height)
        # are identical to an unpadded render, pad rows get no cotangent)
        rgb = rgb[:height]
        loss = main_loss(rgb, gt_image, cfg.ssim_weight)
        return loss, (rgb, radii, n_vis, demand)

    (loss, (rgb, radii, n_vis, demand)), (g_params, g_xys) = (
        jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            state.params, jnp.zeros((capacity, 2), jnp.float32)
        )
    )

    lrs = GaussianParams(
        means=means_lr, scales=cfg.lr_scales, quats=cfg.lr_quats,
        features_dc=cfg.lr_features_dc, features_rest=cfg.lr_features_rest,
        opacities=cfg.lr_opacities,
    )
    new_params, new_opt = adam_update(
        state.params, g_params, state.opt, lrs, state.alive
    )

    stats = state.stats
    if accumulate:
        stats = accumulate_stats(stats, g_xys, radii, height, width)

    new_state = state.replace(params=new_params, opt=new_opt, stats=stats)
    del shard_c
    demand4 = jnp.concatenate([demand, n_vis.astype(jnp.int32)[None]])
    if pending_demand is not None:
        demand4 = jnp.maximum(demand4, pending_demand)
    metrics = {
        "loss": loss,
        "psnr": psnr(rgb, gt_image),
        "n_visible": jnp.sum(radii > 0),
        "n_alive": jnp.sum(new_state.alive),
        # V-budget feedback: the largest per-shard visible count
        "max_shard_visible": n_vis,
        "demand": demand4,
    }
    return new_state, metrics


def _fold_stats_dp_batched(
    stats,
    g_xys: jax.Array,  # (D, C, 2) grads of the GLOBAL mean loss
    radii: jax.Array,  # (D, C) per-camera full-frame radii
    height: int,
    width: int,
    d_total: int,
):
    """Densify-stat fold for a D-camera batch with sequential-reference
    semantics (model.cpp:317-337), as plain jnp over the batch axis so
    GSPMD handles any (data, model) sharding of the operands. Batch slot
    0 plays the reference's "first accumulation after refine" step: its
    grads initialize norms for ALL rows and counts start at 1; later
    cameras add only where visible (same math as dp_trainer's shard_map
    fold — pinned against D sequential steps in tests/test_dp_trainer)."""
    from ..models.gaussians import DensifyStats

    norms = jnp.linalg.norm(g_xys, axis=-1) * d_total  # (D, C)
    visible = radii > 0
    masked = jnp.where(visible, norms, 0.0)
    sum_masked = jnp.sum(masked, axis=0)
    sum_vis = jnp.sum(visible, axis=0).astype(jnp.float32)

    size = radii.astype(jnp.float32) / float(max(height, width))
    max2d_add = jnp.max(jnp.where(visible, size, 0.0), axis=0)

    init = ~stats.initialized
    return DensifyStats(
        xys_grad_norm=jnp.where(
            init,
            norms[0] + (sum_masked - masked[0]),
            stats.xys_grad_norm + sum_masked,
        ),
        vis_counts=jnp.where(
            init,
            1.0 + (sum_vis - visible[0].astype(jnp.float32)),
            stats.vis_counts + sum_vis,
        ),
        max_2d_size=jnp.maximum(stats.max_2d_size, max2d_add),
        initialized=jnp.ones((), bool),
    )


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "height", "width", "sh_deg", "cfg", "accumulate",
        "v_budget", "renderer", "isect_budget", "layout_budget",
        "grad_budget",
    ),
)
def dpgs_train_step(
    state: TrainState,
    cam_to_world: jax.Array,  # (D, 4, 4), D = mesh n_data
    fx: jax.Array,  # (D,)
    fy: jax.Array,
    cx: jax.Array,
    cy: jax.Array,
    gt_images: jax.Array,  # (D, H, W, 3)
    means_lr,
    mesh: Mesh,
    height: int, width: int, sh_deg: int,
    cfg: TrainConfig,
    accumulate: bool,
    v_budget: int,
    renderer: str = "dense",
    isect_budget: int = 0,
    layout_budget: int = 0,
    grad_budget: int = 0,
    pending_demand=None,
) -> Tuple[TrainState, dict]:
    """Hybrid camera-DP x Gaussian-MP step on a 2D (data, model) mesh:
    BOTH scaling axes at once — throughput multiplies with `data`
    (one camera per data slice) while parameter/optimizer/stat memory
    scales 1/M over `model` (scenes beyond one chip's HBM).

    Collective schedule, all emitted by the shard_map transpose:
      * forward: ONE all-gather of frustum-compacted visible subsets
        along 'model' (within each data slice);
      * backward: reduce-scatter of gathered-set grads along 'model'
        (owner shards), THEN a psum along 'data' for the parameter
        grads — the classic DP all-reduce falls out of the transpose of
        the params' data-replicated in_spec, nothing hand-written;
      * densify stats use the D-sequential-reference fold
        (_fold_stats_dp_batched) on (data, model)-sharded per-camera
        xys gradients.

    Requires d_total == mesh.shape['data'] (one camera per data slice).
    metrics['demand'] = running-max (4,) int32 [n_cands, n_isects,
    n_grads, max_shard_visible] over the whole fleet (never-silent
    budgets)."""
    n_model = mesh.shape["model"]
    d_total = cam_to_world.shape[0]
    assert d_total == mesh.shape["data"], (d_total, mesh.shape)
    background = jnp.asarray(DEFAULT_BACKGROUND, jnp.float32)
    capacity = state.alive.shape[0]

    def band_body(params, alive, shifts, c2w, fx_, fy_, cx_, cy_):
        # local slices: params/alive/shifts = my capacity shard (C/M);
        # camera args = my data slice, shape (1, ...)
        rgb, radii, n_vis, demand = _gs_render_core(
            params, alive, shifts[0], c2w[0], fx_[0], fy_[0], cx_[0],
            cy_[0], height=height, width=width, sh_deg=sh_deg,
            background=background, v_budget=v_budget, renderer=renderer,
            isect_budget=isect_budget, layout_budget=layout_budget,
            grad_budget=grad_budget, n_model=n_model,
        )
        n_vis = jax.lax.pmax(jax.lax.pmax(n_vis, "model"), "data")
        demand = jax.lax.pmax(demand, "data")
        return rgb[None], radii[None], n_vis, demand

    render_band = jax.shard_map(
        band_body,
        mesh=mesh,
        in_specs=(
            P("model"), P("model"), P("data", "model"),
            P("data"), P("data"), P("data"), P("data"), P("data"),
        ),
        out_specs=(
            P("data", "model"), P("data", "model"), P(), P(),
        ),
        check_vma=False,
    )

    def loss_fn(params, xys_shift):
        rgb, radii, n_vis, demand = render_band(
            params, state.alive, xys_shift,
            jnp.asarray(cam_to_world, jnp.float32),
            jnp.asarray(fx, jnp.float32), jnp.asarray(fy, jnp.float32),
            jnp.asarray(cx, jnp.float32), jnp.asarray(cy, jnp.float32),
        )
        rgb = rgb[:, :height]  # crop band padding (zero cotangent)
        losses = jax.vmap(
            lambda im, gt: main_loss(im, gt, cfg.ssim_weight)
        )(rgb, gt_images)
        return jnp.sum(losses) / d_total, (rgb, radii, n_vis, demand)

    (loss, (rgb, radii, n_vis, demand)), (g_params, g_xys) = (
        jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            state.params, jnp.zeros((d_total, capacity, 2), jnp.float32)
        )
    )

    lrs = GaussianParams(
        means=means_lr, scales=cfg.lr_scales, quats=cfg.lr_quats,
        features_dc=cfg.lr_features_dc, features_rest=cfg.lr_features_rest,
        opacities=cfg.lr_opacities,
    )
    new_params, new_opt = adam_update(
        state.params, g_params, state.opt, lrs, state.alive
    )

    stats = state.stats
    if accumulate:
        stats = _fold_stats_dp_batched(
            stats, g_xys, radii, height, width, d_total
        )

    new_state = state.replace(params=new_params, opt=new_opt, stats=stats)
    demand4 = jnp.concatenate([demand, n_vis.astype(jnp.int32)[None]])
    if pending_demand is not None:
        demand4 = jnp.maximum(demand4, pending_demand)
    metrics = {
        "loss": loss,
        "psnr": jnp.mean(jax.vmap(psnr)(rgb, gt_images)),
        "n_visible": jnp.sum(jnp.any(radii > 0, axis=0)),
        "n_alive": jnp.sum(new_state.alive),
        "max_shard_visible": n_vis,
        "demand": demand4,
    }
    return new_state, metrics


class GSTrainer(Trainer):
    """Production trainer on Gaussian-sharded state (CLI --model-parallel).

    Drop-in for train.Trainer with the capacity axis sharded P('model')
    across the mesh: every step all-gathers the frustum-compacted visible
    subsets, renders one image band per device, reduce-scatters parameter
    gradients home, and runs Adam + densify statistics shard-local.
    Parameter/optimizer/stat HBM scales ~1/M per device, so scenes too
    large for one chip's memory train on M (BASELINE.md scaling row).

    With n_data > 1 the mesh is 2D (data, model) and every step consumes
    n_data cameras — hybrid camera-DP x Gaussian-MP via dpgs_train_step
    (CLI: --data-parallel D --model-parallel M together): throughput
    scales with D, memory with 1/M, densify stats keep D-sequential-
    reference semantics.

    The refine machine (count_refine_needs / refine_step) runs directly
    on the sharded state — the jitted programs are sharding-agnostic and
    GSPMD inserts the refine collectives; capacity growth happens
    host-side at a multiple of lcm(capacity_round, M) so shards stay
    equal-sized.

    Budget feedback follows Trainer's design with one more axis: besides
    the per-band isect budgets, the static per-shard visible budget V
    adapts from the max_shard_visible running max in metrics["demand"]
    (a (4,) vector here) — truncation of the visible subset is logged
    with its drop count and the budget regrown, never silent.
    """

    _V_BUCKET = 1024
    _V_MARGIN = 1.3

    def __init__(
        self,
        state: TrainState,
        cameras: List,
        cfg: TrainConfig,
        renderer: str = "dense",
        mesh: Optional[Mesh] = None,
        n_model: Optional[int] = None,
        n_data: int = 1,
    ):
        super().__init__(state, cameras, cfg, renderer=renderer)
        if mesh is None:
            n_model = n_model or (len(jax.devices()) // n_data)
            mesh = make_mesh(
                n_data=n_data, n_model=n_model,
                devices=jax.devices()[:n_data * n_model],
            )
        self.mesh = mesh
        self.n_model = mesh.shape["model"]
        self.n_data = mesh.shape["data"]
        self.d_total = self.n_data  # hybrid: one camera per data slice
        self._cam_sharding = NamedSharding(mesh, P("data"))
        cap = state.alive.shape[0]
        if cap % self._capacity_rounding():
            state = grow_capacity(
                state, round_capacity(cap + 1, self._capacity_rounding())
            )
        self.state = shard_state(mesh, state)
        self._rep = NamedSharding(mesh, P())
        self._pending_demand = self._zero_pending()
        # visible-subset budget: start at the full shard (cannot
        # truncate), then shrink/grow from max_shard_visible feedback
        self._v_budget = self._shard_c()
        self.v_overflow_events = 0

    def _zero_pending(self):
        return jax.device_put(jnp.zeros((4,), jnp.int32), self._rep)

    def _shard_c(self) -> int:
        return self.state.alive.shape[0] // self.n_model

    def _capacity_rounding(self) -> int:
        return math.lcm(self.cfg.capacity_round, getattr(self, "n_model", 1))

    def _fit_v(self, demand: int):
        cur = self._v_budget
        shard_c = self._shard_c()
        want = min(
            shard_c,
            ((int(demand * self._V_MARGIN) + self._V_BUCKET - 1)
             // self._V_BUCKET) * self._V_BUCKET,
        )
        want = max(want, min(demand, shard_c), 1)
        if demand > cur or want < cur * 0.6 or cur > shard_c:
            self._v_budget = want

    def _check_v_overflow(self, max_vis: int):
        if max_vis > self._v_budget:
            self.v_overflow_events += 1
            print(
                f"[opensplat_tpu] visible-subset budget overflow: shard "
                f"demand {max_vis} > V budget {self._v_budget} "
                f"({max_vis - self._v_budget} visible gaussians truncated "
                f"in >=1 recent step); regrowing"
            )
        self._fit_v(max_vis)

    def run_step(self, step: int) -> StepOutcome:
        cfg = self.cfg
        factor = get_downscale_factor(step, cfg)
        if self.n_data > 1:
            (h, w), batch = self._sample_batch(factor)
        else:
            cam_idx = self.sampler.next()
            cam = self.cameras[cam_idx]
            gt = self._gt_on_device(cam_idx, factor)
            h, w = gt.shape[0], gt.shape[1]
        if (h, w) != self.last_hw:
            self._pending_demand = self._zero_pending()
        self.last_hw = (h, w)
        sh_deg = sh_degrees_for_step(step, cfg)
        means_lr = means_lr_schedule(
            cfg.lr_means, cfg.lr_means_final, cfg.num_iters, step - 1
        )
        accumulate = step < cfg.stop_split_at
        common = dict(
            mesh=self.mesh, height=h, width=w, sh_deg=sh_deg, cfg=cfg,
            accumulate=accumulate, v_budget=self._v_budget,
            renderer=self.renderer,
            isect_budget=self._budget_for(h, w)[0],
            layout_budget=self._budget_for(h, w)[1],
            grad_budget=self._budget_for(h, w)[2],
            pending_demand=self._pending_demand,
        )

        if self.n_data > 1:
            # hybrid camera-DP x Gaussian-MP on the 2D mesh
            def put(arr):
                return jax.device_put(
                    jnp.asarray(arr, jnp.float32), self._cam_sharding
                )

            self.state, metrics = dpgs_train_step(
                self.state,
                put(np.stack([c.cam_to_world for c, _ in batch])),
                put(np.asarray([c.fx / factor for c, _ in batch])),
                put(np.asarray([c.fy / factor for c, _ in batch])),
                put(np.asarray([c.cx / factor for c, _ in batch])),
                put(np.asarray([c.cy / factor for c, _ in batch])),
                # gt batch stays on-device (Trainer._gt_on_device cache)
                put(jnp.stack([g for _, g in batch])),
                means_lr,
                **common,
            )
        else:
            self.state, metrics = gs_train_step(
                self.state,
                jnp.asarray(cam.cam_to_world, jnp.float32),
                cam.fx / factor,
                cam.fy / factor,
                cam.cx / factor,
                cam.cy / factor,
                gt,
                means_lr,
                **common,
            )
        self._pending_demand = metrics["demand"]
        if step <= 3 or step % 10 == 0 or step % cfg.refine_every == 0:
            d = np.asarray(metrics["demand"])
            self._check_overflow(h, w, int(d[0]), int(d[1]), int(d[2]))
            self._check_v_overflow(int(d[3]))
            self._pending_demand = self._zero_pending()

        if step % cfg.refine_every == 0 and step > cfg.warmup_length:
            # the jitted refine programs run on the sharded state (GSPMD
            # collectives); growth/stat rebuilds re-pin to the mesh after
            self._refine(step)
            self.state = shard_state(self.mesh, self.state)
            added = int((self.refine_metrics or {}).get("added", 0))
            if added:
                # densification may land every new gaussian in ONE shard:
                # raise V proactively so the steps before the next sync
                # point cannot truncate (d exists: a refine boundary is
                # always a sync point above)
                self._fit_v(min(self._shard_c(), int(d[3]) + added))

        return StepOutcome(metrics)

    def render(self, cam, step: int):
        """gs_render with the Trainer's never-silent budget feedback:
        any isect/V overflow regrows the budget and re-renders once."""
        cfg = self.cfg
        factor = get_downscale_factor(step, cfg)
        h = int(cam.height / factor)
        w = int(cam.width / factor)
        sh_deg = sh_degrees_for_step(step, cfg)

        def go():
            return gs_render(
                self.state,
                jnp.asarray(cam.cam_to_world, jnp.float32),
                cam.fx / factor, cam.fy / factor,
                cam.cx / factor, cam.cy / factor,
                self.mesh, h, w, sh_deg,
                v_budget=self._v_budget, renderer=self.renderer,
                isect_budget=self._budget_for(h, w)[0],
                layout_budget=self._budget_for(h, w)[1],
            )

        rgb, n_vis, demand = go()
        nv = int(n_vis)
        redo = False
        if nv > self._v_budget:
            self._check_v_overflow(nv)
            redo = True
        if self.renderer in ("tiled", "pallas"):
            exp_b, lay_b = self._budget_for(h, w)[:2]
            eff_exp = exp_b or max(8 * self._v_budget * self.n_model, 128)
            eff_lay = lay_b or eff_exp
            nc, ni = int(demand[0]), int(demand[1])
            if nc > eff_exp or ni > eff_lay:
                self._update_budget(h, w, nc, ni)
                redo = redo or self._budget_for(h, w)[:2] != (exp_b, lay_b)
        if redo:
            rgb, _, _ = go()
        return rgb
