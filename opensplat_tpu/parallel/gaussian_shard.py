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

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TrainConfig
from ..models.densify import accumulate_stats
from ..models.gaussians import GaussianParams, TrainState
from ..models.splat_model import DEFAULT_BACKGROUND, render_forward
from ..ops.projection import project_gaussians
from ..ops.camera import camera_matrices
from ..ops.ssim import main_loss, psnr
from ..optim.adam import adam_update


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


def _gs_render_core(
    params_shard: GaussianParams,
    alive_shard: jax.Array,
    xys_shift_shard: jax.Array,
    cam_to_world, fx, fy, cx, cy,
    height: int, width: int, sh_deg: int, background,
    v_budget: int, renderer: str,
    isect_budget: int, layout_budget: int, n_model: int,
):
    """shard_map body: compact-gather-render one band. Returns
    (band_rgb, band_radii_shard, n_visible_shard)."""
    m = jax.lax.axis_index("model")
    band_h = height // n_model

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
        fov_height=height,
    )
    # full-frame radii per gathered row (a gaussian may be visible only
    # in ANOTHER device's band; radii values agree across bands where
    # visible, so pmax reconstructs the full-image radii), then my
    # shard's rows scatter home (V-scale)
    radii_all = jax.lax.pmax(out.radii, "model")  # (M*V,)
    my_radii = jax.lax.dynamic_slice_in_dim(radii_all, m * v_budget, v_budget)
    radii_shard = (
        jnp.zeros_like(alive_shard, jnp.int32).at[idx].max(
            my_radii, mode="drop"
        )
    )
    return out.rgb, radii_shard, n_visible


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
    Returns (rgb (H, W, 3) row-sharded, max visible count per shard)."""
    n_model = mesh.shape["model"]
    assert height % (16 * n_model) == 0, (height, n_model)
    background = jnp.asarray(DEFAULT_BACKGROUND, jnp.float32)
    capacity = state.alive.shape[0]

    def body(params, alive, c2w, fx_, fy_, cx_, cy_):
        rgb, _, n_vis = _gs_render_core(
            params, alive, jnp.zeros((capacity // n_model, 2), jnp.float32),
            c2w, fx_, fy_, cx_, cy_, height, width, sh_deg,
            background, v_budget, renderer, isect_budget, layout_budget,
            n_model,
        )
        return rgb, jax.lax.pmax(n_vis, "model")

    rgb, n_vis = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("model"), P("model"), P(), P(), P(), P(), P()),
        out_specs=(P("model"), P()),
        check_vma=False,
    )(
        state.params, state.alive,
        jnp.asarray(cam_to_world, jnp.float32),
        jnp.asarray(fx, jnp.float32), jnp.asarray(fy, jnp.float32),
        jnp.asarray(cx, jnp.float32), jnp.asarray(cy, jnp.float32),
    )
    return rgb, n_vis


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "height", "width", "sh_deg", "cfg", "accumulate",
        "v_budget", "renderer", "isect_budget", "layout_budget",
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
) -> Tuple[TrainState, dict]:
    """One training step on Gaussian-sharded state: forward all-gather of
    frustum-compacted subsets, banded rasterization, reduce-scatter of
    gradients back to the owner shards (via the shard_map transpose),
    shard-local Adam + densify statistics."""
    n_model = mesh.shape["model"]
    assert height % (16 * n_model) == 0, (height, n_model)
    background = jnp.asarray(DEFAULT_BACKGROUND, jnp.float32)
    capacity = state.alive.shape[0]
    shard_c = capacity // n_model

    def band_body(params, alive, shifts, c2w, fx_, fy_, cx_, cy_):
        rgb, radii, n_vis = _gs_render_core(
            params, alive, shifts, c2w, fx_, fy_, cx_, cy_,
            height=height, width=width, sh_deg=sh_deg,
            background=background, v_budget=v_budget, renderer=renderer,
            isect_budget=isect_budget, layout_budget=layout_budget,
            n_model=n_model,
        )
        return rgb, radii, jax.lax.pmax(n_vis, "model")

    render_band = jax.shard_map(
        band_body,
        mesh=mesh,
        in_specs=(
            P("model"), P("model"), P("model"),
            P(), P(), P(), P(), P(),
        ),
        out_specs=(P("model"), P("model"), P()),
        check_vma=False,
    )

    def loss_fn(params, xys_shift):
        rgb, radii, n_vis = render_band(
            params, state.alive, xys_shift,
            jnp.asarray(cam_to_world, jnp.float32),
            jnp.asarray(fx, jnp.float32), jnp.asarray(fy, jnp.float32),
            jnp.asarray(cx, jnp.float32), jnp.asarray(cy, jnp.float32),
        )
        loss = main_loss(rgb, gt_image, cfg.ssim_weight)
        return loss, (rgb, radii, n_vis)

    (loss, (rgb, radii, n_vis)), (g_params, g_xys) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(state.params, jnp.zeros((capacity, 2), jnp.float32))

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
    metrics = {
        "loss": loss,
        "psnr": psnr(rgb, gt_image),
        "n_visible": jnp.sum(radii > 0),
        "n_alive": jnp.sum(new_state.alive),
        # V-budget feedback: the largest per-shard visible count
        "max_shard_visible": n_vis,
    }
    return new_state, metrics
