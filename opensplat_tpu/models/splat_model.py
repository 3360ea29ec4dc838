"""Scene forward pass: camera -> projection -> SH colors -> rasterize.

Mirrors Model::forward (model.cpp:83-225) with TPU-native changes:
  * no host sync on radii.sum() == 0 (model.cpp:173) — an empty frame
    renders the background naturally through the masked rasterizer;
  * xys.retain_grad() (model.cpp:171) becomes an explicit additive
    `xys_shift` input whose gradient is d loss / d xys (densify stats);
  * dead capacity slots are masked out at projection.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.camera import camera_matrices
from ..ops.projection import project_gaussians
from ..ops.rasterize import rasterize
from ..ops.sh import spherical_harmonics
from .gaussians import GaussianParams

# NerfStudio default background (model.hpp:54)
DEFAULT_BACKGROUND = (0.6130, 0.0101, 0.3984)


class RenderOutputs(NamedTuple):
    rgb: jax.Array  # (H, W, 3)
    final_t: jax.Array  # (H, W)
    radii: jax.Array  # (C,) int32
    mask: jax.Array  # (C,) bool visible
    xys: jax.Array  # (C, 2)
    depths: jax.Array  # (C,)
    n_isects: jax.Array  # () int32 layout-buffer demand (0 for dense)
    n_cands: jax.Array  # () int32 candidate-expansion demand (0 for dense)
    n_grads: jax.Array  # () int32 compact gradient-stream demand (pallas)


def render_forward(
    params: GaussianParams,
    alive: jax.Array,
    cam_to_world: jax.Array,
    fx,
    fy,
    cx,
    cy,
    height: int,
    width: int,
    sh_degrees_to_use: int,
    background: jax.Array,
    xys_shift: Optional[jax.Array] = None,
    renderer: str = "dense",
    isect_budget: int = 0,
    layout_budget: int = 0,
    grad_budget: int = 0,
    fov_width: Optional[int] = None,
    fov_height: Optional[int] = None,
) -> RenderOutputs:
    """fov_width/fov_height: render a BAND of a larger image with the
    full frame's EWA fov clamp (parallel/gaussian_shard.py)."""
    viewmat, full_proj, cam_pos = camera_matrices(cam_to_world, fx, fy, width, height)

    proj = project_gaussians(
        params.means,
        jnp.exp(params.scales),
        1.0,
        params.quats / jnp.linalg.norm(params.quats, axis=-1, keepdims=True),
        viewmat,
        full_proj,
        fx,
        fy,
        cx,
        cy,
        height,
        width,
        mode="gpu",
        valid_mask=alive,
        fov_width=fov_width,
        fov_height=fov_height,
        # opacity-aware tile bboxes (binning only; radii/mask keep the
        # reference 3-sigma semantics — see project_gaussians)
        opacities=jax.lax.stop_gradient(jax.nn.sigmoid(params.opacities)),
    )
    xys = proj.xys if xys_shift is None else proj.xys + xys_shift

    # SH view directions from detached means (model.cpp:176-177)
    viewdirs = jax.lax.stop_gradient(params.means) - cam_pos
    norm = jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)
    viewdirs = viewdirs / jnp.maximum(norm, 1e-12)

    colors = jnp.concatenate(
        [params.features_dc[:, None, :], params.features_rest], axis=1
    )
    rgbs = spherical_harmonics(sh_degrees_to_use, viewdirs, colors)
    rgbs = jnp.maximum(rgbs + 0.5, 0.0)  # model.cpp:192

    n_isects = jnp.zeros((), jnp.int32)
    n_cands = jnp.zeros((), jnp.int32)
    n_grads = jnp.zeros((), jnp.int32)
    raster_args = (
        xys,
        proj.conics,
        rgbs,
        jax.nn.sigmoid(params.opacities),
        proj.depths,
        proj.radii,
        proj.num_tiles_hit,
        proj.tile_min,
        proj.tile_max,
        background,
        height,
        width,
    )
    if renderer == "dense":
        rgb, final_t = rasterize(
            xys,
            proj.conics,
            rgbs,
            jax.nn.sigmoid(params.opacities),
            proj.depths,
            proj.mask,
            background,
            height,
            width,
        )
    elif renderer == "tiled":
        from ..ops.rasterize_tiled import rasterize_tiled
        from ..ops.binning import count_isects

        _, n_isects = count_isects(proj, height, width, align=1)
        n_cands = n_isects
        rgb, final_t = rasterize_tiled(*raster_args, max_isects=isect_budget)
    elif renderer == "pallas":
        from ..ops.pallas.integration import rasterize_pallas

        # candidate-expansion demand (exact even under overflow); the
        # post-cull layout demand comes back from the binning itself
        from ..ops.binning import count_isects

        _, n_cands = count_isects(proj, height, width, align=1)
        rgb, final_t, n_isects, n_grads = rasterize_pallas(
            *raster_args, max_isects=isect_budget, layout_isects=layout_budget,
            grad_isects=grad_budget, return_isects=True,
        )
    else:
        raise ValueError(f"unknown renderer {renderer!r}")

    rgb = jnp.minimum(rgb, 1.0)  # model.cpp:222
    return RenderOutputs(
        rgb=rgb,
        final_t=final_t,
        radii=proj.radii,
        mask=proj.mask,
        xys=xys,
        depths=proj.depths,
        n_isects=n_isects,
        n_cands=n_cands,
        n_grads=n_grads,
    )


def render_depth(
    params: GaussianParams,
    alive: jax.Array,
    cam_to_world: jax.Array,
    fx,
    fy,
    cx,
    cy,
    height: int,
    width: int,
    mode: str = "expected",
    max_isects: int = 0,
):
    """Depth-map render on the channel-generic tiled fast path (the
    nd_ rasterization the reference exposes through gsplat,
    forward.cu:174-254, with camera-space depth as the single channel).

    mode="accumulated": sum_i alpha_i T_i d_i (raw compositing weights);
    mode="expected":    accumulated / (1 - final_T) — expected depth per
                        pixel, background pixels (nothing hit) = 0.

    Returns (depth (H, W), alpha (H, W)) with alpha = 1 - final_T.
    Differentiable (depth flows to means via the projection chain)."""
    from ..ops.rasterize_tiled import rasterize_tiled

    viewmat, full_proj, _ = camera_matrices(cam_to_world, fx, fy, width, height)
    proj = project_gaussians(
        params.means,
        jnp.exp(params.scales),
        1.0,
        params.quats / jnp.linalg.norm(params.quats, axis=-1, keepdims=True),
        viewmat,
        full_proj,
        fx, fy, cx, cy, height, width,
        mode="gpu",
        valid_mask=alive,
        opacities=jax.lax.stop_gradient(jax.nn.sigmoid(params.opacities)),
    )
    acc, final_t = rasterize_tiled(
        proj.xys,
        proj.conics,
        # CH=1: camera-space z as the composited channel
        # (ProjectedGaussians.depths; .cam_depths is NDC z)
        proj.depths[:, None],
        jax.nn.sigmoid(params.opacities),
        proj.depths,
        proj.radii,
        proj.num_tiles_hit,
        proj.tile_min,
        proj.tile_max,
        jnp.zeros((1,), jnp.float32),
        height,
        width,
        max_isects=max_isects,
    )
    depth = acc[..., 0]
    alpha = 1.0 - final_t
    if mode == "expected":
        depth = jnp.where(alpha > 1e-6, depth / jnp.maximum(alpha, 1e-6), 0.0)
    elif mode != "accumulated":
        raise ValueError(f"unknown depth mode {mode!r}")
    return depth, alpha
