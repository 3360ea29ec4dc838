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
  * densification statistics accumulate each camera independently, the
    batch acting like D reference steps: vis_counts += sum_d visible_d
    and grad norms sum over cameras where visible (per-camera xy
    gradients are recovered by giving each camera its own xys_shift).
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


@partial(
    jax.jit,
    static_argnames=("height", "width", "sh_deg", "cfg", "accumulate", "renderer"),
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
):
    background = jnp.asarray(DEFAULT_BACKGROUND, jnp.float32)
    d = cam_to_world.shape[0]
    capacity = state.alive.shape[0]

    def per_cam(params, xys_shift, c2w, fx_, fy_, cx_, cy_, gt):
        out = render_forward(
            params, state.alive, c2w, fx_, fy_, cx_, cy_,
            height, width, sh_deg, background,
            xys_shift=xys_shift, renderer=renderer,
        )
        return main_loss(out.rgb, gt, cfg.ssim_weight), (out.radii, psnr(out.rgb, gt))

    def loss_fn(params, xys_shifts):
        losses, aux = jax.vmap(
            per_cam, in_axes=(None, 0, 0, 0, 0, 0, 0, 0)
        )(params, xys_shifts, cam_to_world, fx, fy, cx, cy, gt_images)
        return losses.mean(), aux

    (loss, (radii_b, psnr_b)), (g_params, g_xys_b) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(state.params, jnp.zeros((d, capacity, 2), jnp.float32))

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
        visible_b = radii_b > 0  # (D, C)
        # undo the 1/D mean scaling so each camera contributes a
        # reference-step-equivalent gradient-norm sample
        norms_b = jnp.linalg.norm(g_xys_b, axis=-1) * d  # (D, C)
        vis_count_add = jnp.sum(visible_b, axis=0).astype(jnp.float32)
        norm_add = jnp.sum(jnp.where(visible_b, norms_b, 0.0), axis=0)
        size_b = radii_b.astype(jnp.float32) / float(max(height, width))
        max2d_b = jnp.max(jnp.where(visible_b, size_b, 0.0), axis=0)

        init = ~stats.initialized
        stats = DensifyStats(
            xys_grad_norm=jnp.where(init, norm_add, stats.xys_grad_norm + norm_add),
            vis_counts=jnp.where(
                init,
                jnp.maximum(vis_count_add, 1.0),
                stats.vis_counts + vis_count_add,
            ),
            max_2d_size=jnp.maximum(stats.max_2d_size, max2d_b),
            initialized=jnp.ones((), bool),
        )

    new_state = state.replace(params=new_params, opt=new_opt, stats=stats)
    metrics = {"loss": loss, "psnr": psnr_b.mean(), "n_visible": jnp.sum(radii_b > 0)}
    return new_state, metrics
