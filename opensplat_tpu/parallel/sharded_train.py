"""Camera-data-parallel (optionally Gaussian-sharded) training step.

A batch of D cameras renders in parallel, one camera per data-mesh slot
(the "multi-scene / one camera per chip" scaling axis from BASELINE.json).
Parameters live replicated across `data` and (optionally) sharded along
the capacity axis across `model`; XLA inserts the gradient all-reduce
over ICI automatically from the shardings.

Semantics notes vs the single-camera reference loop:
  * the loss is the MEAN over the camera batch, so per-step effective
    learning rates match a D-step reference average rather than D
    sequential steps (standard DP semantics);
  * densification statistics reproduce D sequential reference steps
    EXACTLY (model.cpp:317-337 incl. the first-accumulation init quirk
    where camera 0 plays the role of "the first step after a refine"):
    per-camera xy gradients are recovered by giving each camera its own
    xys_shift and multiplying by D to undo the mean scaling. With frozen
    params the batched stats equal D sequential accumulations bit-for-fp
    (tests/test_parallel.py pins this, incl. identical refine masks).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import TrainConfig
from ..models.gaussians import DensifyStats, GaussianParams, TrainState
from ..models.splat_model import DEFAULT_BACKGROUND, render_forward
from ..ops.ssim import main_loss, psnr
from ..optim.adam import adam_update


def accumulate_stats_batched(
    stats: DensifyStats,
    g_xys_b: jax.Array,  # (D, C, 2) grads of the MEAN loss wrt per-cam shifts
    radii_b: jax.Array,  # (D, C)
    height: int,
    width: int,
) -> DensifyStats:
    """Fold a D-camera batch into the densify statistics with reference
    sequential-step semantics (model.cpp:317-337): camera d behaves like
    reference step d. On the first accumulation after a refine the
    reference initializes norms with the step's grads for ALL Gaussians
    and vis_counts to 1 (model.cpp:321-323) — camera 0 takes that role;
    cameras 1..D-1 contribute only where visible."""
    d = g_xys_b.shape[0]
    visible_b = radii_b > 0  # (D, C)
    # undo the 1/D mean-loss scaling: each camera's grad norm matches the
    # single-camera reference step's
    norms_b = jnp.linalg.norm(g_xys_b, axis=-1) * d  # (D, C)
    masked = jnp.where(visible_b, norms_b, 0.0)

    init = ~stats.initialized
    norm_init = norms_b[0] + jnp.sum(masked[1:], axis=0)
    norm_cont = stats.xys_grad_norm + jnp.sum(masked, axis=0)
    counts_init = 1.0 + jnp.sum(visible_b[1:], axis=0).astype(jnp.float32)
    counts_cont = stats.vis_counts + jnp.sum(visible_b, axis=0).astype(
        jnp.float32
    )

    size_b = radii_b.astype(jnp.float32) / float(max(height, width))
    max2d_add = jnp.max(jnp.where(visible_b, size_b, 0.0), axis=0)

    return DensifyStats(
        xys_grad_norm=jnp.where(init, norm_init, norm_cont),
        vis_counts=jnp.where(init, counts_init, counts_cont),
        max_2d_size=jnp.maximum(stats.max_2d_size, max2d_add),
        initialized=jnp.ones((), bool),
    )


@partial(
    jax.jit,
    static_argnames=(
        "height", "width", "sh_deg", "cfg", "accumulate", "renderer",
        "isect_budget", "layout_budget", "grad_budget",
    ),
)
def batched_train_step(
    state: TrainState,
    cam_to_world: jax.Array,  # (D, 4, 4)
    fx: jax.Array,  # (D,)
    fy: jax.Array,
    cx: jax.Array,
    cy: jax.Array,
    gt_images: jax.Array,  # (D, H, W, 3)
    means_lr,
    height: int,
    width: int,
    sh_deg: int,
    cfg: TrainConfig,
    accumulate: bool,
    renderer: str = "dense",
    isect_budget: int = 0,
    layout_budget: int = 0,
    grad_budget: int = 0,
    pending_demand=None,
):
    """One camera-DP training step on the production renderer.

    `isect_budget`/`layout_budget` are PER-CAMERA static intersection
    budgets (each camera slot runs its own binning stream); metrics
    carry `demand` = the per-camera max of [n_cands, n_isects, n_grads]
    across
    the batch (folded with `pending_demand`) for the host budget
    feedback — overflow is never silent (SURVEY.md §7 hard-part 3)."""
    background = jnp.asarray(DEFAULT_BACKGROUND, jnp.float32)
    d = cam_to_world.shape[0]
    capacity = state.alive.shape[0]

    def per_cam(params, xys_shift, c2w, fx_, fy_, cx_, cy_, gt):
        out = render_forward(
            params, state.alive, c2w, fx_, fy_, cx_, cy_,
            height, width, sh_deg, background,
            xys_shift=xys_shift, renderer=renderer,
            isect_budget=isect_budget, layout_budget=layout_budget,
            grad_budget=grad_budget,
        )
        return (
            main_loss(out.rgb, gt, cfg.ssim_weight),
            (out.radii, psnr(out.rgb, gt), out.n_cands, out.n_isects,
             out.n_grads),
        )

    def loss_fn(params, xys_shifts):
        losses, aux = jax.vmap(
            per_cam, in_axes=(None, 0, 0, 0, 0, 0, 0, 0)
        )(params, xys_shifts, cam_to_world, fx, fy, cx, cy, gt_images)
        return losses.mean(), aux

    (loss, (radii_b, psnr_b, cands_b, isects_b, grads_b)), (g_params, g_xys_b) = (
        jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            state.params, jnp.zeros((d, capacity, 2), jnp.float32)
        )
    )

    lrs = GaussianParams(
        means=means_lr,
        scales=cfg.lr_scales,
        quats=cfg.lr_quats,
        features_dc=cfg.lr_features_dc,
        features_rest=cfg.lr_features_rest,
        opacities=cfg.lr_opacities,
    )
    new_params, new_opt = adam_update(state.params, g_params, state.opt, lrs, state.alive)

    stats = state.stats
    if accumulate:
        stats = accumulate_stats_batched(stats, g_xys_b, radii_b, height, width)

    new_state = state.replace(params=new_params, opt=new_opt, stats=stats)
    demand = jnp.stack(
        [jnp.max(cands_b).astype(jnp.int32),
         jnp.max(isects_b).astype(jnp.int32),
         jnp.max(grads_b).astype(jnp.int32)]
    )
    if pending_demand is not None:
        demand = jnp.maximum(demand, pending_demand)
    metrics = {
        "loss": loss,
        "psnr": psnr_b.mean(),
        "n_visible": jnp.sum(radii_b > 0),
        "n_alive": jnp.sum(new_state.alive),
        "demand": demand,
    }
    return new_state, metrics
