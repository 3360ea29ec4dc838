"""gsplat-compatible functional API.

The reference vendors gsplat and exposes 11 kernel entry points
(rasterizer/gsplat/ext.cpp:4-18). This module provides the same
capabilities 1:1 on the TPU-native ops so users of the gsplat Python API
can map their calls directly. Signatures are jnp-native (no torch
tensors) and backward passes are returned from explicit *_backward
functions mirroring the reference pairs, even though in JAX you would
normally just `jax.grad` through the forward.

Entry point mapping (reference -> here):
  project_gaussians_forward   -> project_gaussians_forward
  project_gaussians_backward  -> project_gaussians_backward
  rasterize_forward           -> rasterize_forward
  rasterize_backward          -> rasterize_backward
  nd_rasterize_forward        -> nd_rasterize_forward
  nd_rasterize_backward       -> nd_rasterize_backward
  compute_sh_forward          -> compute_sh_forward
  compute_sh_backward         -> compute_sh_backward
  compute_cov2d_bounds        -> compute_cov2d_bounds (ops.projection)
  map_gaussian_to_intersects  -> map_gaussian_to_intersects
  get_tile_bin_edges          -> get_tile_bin_edges
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .ops.binning import BinnedGaussians, bin_gaussians, num_tiles
from .ops.projection import (
    ProjectedGaussians,
    compute_cov2d_bounds,  # noqa: F401  (re-exported entry point)
    project_gaussians,
)
from .ops.rasterize import rasterize
from .ops.rasterize_tiled import rasterize_tiled
from .ops.sh import eval_sh_basis, num_sh_bases, spherical_harmonics
from .ops.tensor_math import quat_to_rotmat

__all__ = [
    "project_gaussians_forward",
    "project_gaussians_backward",
    "rasterize_forward",
    "rasterize_backward",
    "nd_rasterize_forward",
    "nd_rasterize_backward",
    "compute_sh_forward",
    "compute_sh_backward",
    "compute_cov2d_bounds",
    "map_gaussian_to_intersects",
    "get_tile_bin_edges",
]


def _cov3d(scales, glob_scale, quats):
    """Packed upper-triangular 3D covariance (N, 6), matching the
    reference's cov3d output layout (forward.cu:450-470)."""
    R = quat_to_rotmat(quats)
    M = R * (glob_scale * scales)[:, None, :]
    cov = M @ jnp.swapaxes(M, -1, -2)
    return jnp.stack(
        [cov[:, 0, 0], cov[:, 0, 1], cov[:, 0, 2],
         cov[:, 1, 1], cov[:, 1, 2], cov[:, 2, 2]],
        axis=-1,
    )


def project_gaussians_forward(
    means3d, scales, glob_scale, quats, viewmat, projmat,
    fx, fy, cx, cy, img_height, img_width, clip_thresh=0.01,
):
    """(cov3d, xys, depths, radii, conics, num_tiles_hit) — the reference's
    project_gaussians_forward_tensor outputs (bindings.cu:133-207)."""
    proj = project_gaussians(
        means3d, scales, glob_scale, quats, viewmat, projmat,
        fx, fy, cx, cy, img_height, img_width, clip_thresh=clip_thresh,
    )
    cov3d = _cov3d(scales, glob_scale, quats)
    return (cov3d, proj.xys, proj.depths, proj.radii, proj.conics,
            proj.num_tiles_hit)


def project_gaussians_backward(
    means3d, scales, glob_scale, quats, viewmat, projmat,
    fx, fy, cx, cy, img_height, img_width,
    cov3d, radii, conics, v_xy, v_depth, v_conic,
):
    """(v_cov2d*, v_cov3d*, v_mean3d, v_scale, v_quat) gradient chain of
    the reference's hand-written VJPs (backward.cu:357-542) — computed
    here by jax.vjp through the same forward math. Only the parameter
    gradients (v_mean3d, v_scale, v_quat) are returned; the reference's
    intermediate cov gradients are an implementation detail it exposes.
    """

    def fwd(means3d, scales, quats):
        proj = project_gaussians(
            means3d, scales, glob_scale, quats, viewmat, projmat,
            fx, fy, cx, cy, img_height, img_width,
        )
        return proj.xys, proj.depths, proj.conics

    _, vjp = jax.vjp(fwd, means3d, scales, quats)
    return vjp((v_xy, v_depth, v_conic))


def rasterize_forward(
    xys, depths, radii, conics, num_tiles_hit, colors, opacity,
    img_height, img_width, background,
):
    """(out_img, final_Ts) — functional analogue of
    rasterize_forward_tensor (bindings.cu:338-...); binning happens
    internally (the reference requires the caller to pre-sort, ours is
    self-contained like its RasterizeGaussians autograd wrapper,
    rasterize_gaussians.cpp:39-91)."""
    valid = radii > 0
    return rasterize(
        xys, conics, colors, opacity.reshape(-1), depths, valid,
        background, img_height, img_width,
    )


def rasterize_backward(
    xys, depths, radii, conics, num_tiles_hit, colors, opacity,
    img_height, img_width, background, v_out_img, v_out_alpha=None,
):
    """(v_xy, v_conic, v_colors, v_opacity) like
    rasterize_backward_tensor (bindings.cu:569-...)."""
    valid = radii > 0
    if v_out_alpha is None:
        v_out_alpha = jnp.zeros((img_height, img_width), jnp.float32)

    def fwd(xys, conics, colors, opacity):
        img, final_t = rasterize(
            xys, conics, colors, opacity.reshape(-1), depths, valid,
            background, img_height, img_width,
        )
        return img, final_t

    _, vjp = jax.vjp(fwd, xys, conics, colors, opacity)
    return vjp((v_out_img, v_out_alpha))


def nd_rasterize_forward(
    xys, depths, radii, conics, num_tiles_hit, colors, opacity,
    img_height, img_width, background, max_isects: int = 0,
):
    """Channel-generic rasterization on the TILED fast path (work
    proportional to the intersection count, like the reference's
    production nd_rasterize_forward, forward.cu:174-254 — NOT the dense
    conformance renderer). colors: (N, CH) for any CH (depth maps,
    feature planes, RGB+alpha, ...); background: (CH,).

    Returns (out_img (H, W, CH), final_Ts (H, W))."""
    proj = _proj_like(
        xys, depths, radii, num_tiles_hit.astype(jnp.int32),
        img_height, img_width,
    )
    return rasterize_tiled(
        xys, conics, colors, opacity.reshape(-1), depths, radii,
        proj.num_tiles_hit, proj.tile_min, proj.tile_max,
        jnp.asarray(background, jnp.float32), img_height, img_width,
        max_isects=max_isects,
    )


def nd_rasterize_backward(
    xys, depths, radii, conics, num_tiles_hit, colors, opacity,
    img_height, img_width, background, v_out_img, v_out_alpha=None,
    max_isects: int = 0,
):
    """(v_xy, v_conic, v_colors, v_opacity) for any channel count —
    backward.cu:15-129 parity, computed through the tiled fast path's
    custom VJP."""
    if v_out_alpha is None:
        v_out_alpha = jnp.zeros((img_height, img_width), jnp.float32)

    def fwd(xys, conics, colors, opacity):
        return nd_rasterize_forward(
            xys, depths, radii, conics, num_tiles_hit, colors, opacity,
            img_height, img_width, background, max_isects=max_isects,
        )

    _, vjp = jax.vjp(fwd, xys, conics, colors, opacity)
    return vjp((v_out_img, v_out_alpha))


def compute_sh_forward(degrees_to_use, viewdirs, coeffs):
    """RGB from SH coefficients (sh.cuh:218-238 / bindings.cu:68-...).
    coeffs: (N, num_bases, 3)."""
    degree = {1: 0, 4: 1, 9: 2, 16: 3, 25: 4}[coeffs.shape[-2]]
    del degree  # total bases are implied by the coeffs shape
    return spherical_harmonics(degrees_to_use, viewdirs, coeffs)


def compute_sh_backward(degrees_to_use, viewdirs, coeffs, v_colors):
    """v_coeffs = basis x v_colors outer product (sh.cuh:240-260)."""
    _, vjp = jax.vjp(
        lambda c: spherical_harmonics(degrees_to_use, viewdirs, c), coeffs
    )
    return vjp(v_colors)[0]


def map_gaussian_to_intersects(
    num_points, num_intersects, xys, depths, radii, cum_tiles_hit,
    tile_bounds,
) -> Tuple[jax.Array, jax.Array]:
    """(isect_ids_sorted, gaussian_ids_sorted) — the reference emits
    unsorted 64-bit keys `(tile_id << 32) | depth_bits` (forward.cu:132-137)
    then radix-sorts them; TPU has no int64 sort so this returns the
    lexicographically (tile_id, depth_bits)-sorted stream directly:
    isect_ids as (I, 2) int32 pairs [tile_id, depth_bits], where
    depth_bits is the float32 bit pattern of the camera-space depth
    (monotone for positive depths — the same key trick). Entries past the
    true intersection count carry the sentinel pair (n_tiles, INT32_MAX)
    and gaussian id == num_points."""
    tb_x, tb_y = tile_bounds[0], tile_bounds[1]
    width = tb_x * 16
    height = tb_y * 16
    num_tiles_hit_arr = jnp.diff(
        jnp.concatenate([jnp.zeros((1,), cum_tiles_hit.dtype), cum_tiles_hit])
    ).astype(jnp.int32)
    proj = _proj_like(xys, depths, radii, num_tiles_hit_arr, height, width)
    binned = bin_gaussians(proj, height, width, int(num_intersects))
    depth_bits_g = jax.lax.bitcast_convert_type(
        depths.astype(jnp.float32), jnp.int32
    )
    depth_bits = jnp.where(
        binned.valid,
        jnp.take(depth_bits_g, binned.gauss_ids, mode="fill",
                 fill_value=jnp.iinfo(jnp.int32).max),
        jnp.iinfo(jnp.int32).max,
    )
    isect_ids = jnp.stack([binned.tile_ids, depth_bits], axis=-1)
    return isect_ids, binned.gauss_ids


def get_tile_bin_edges(
    num_intersects, isect_ids_sorted, num_tiles: int | None = None
) -> jax.Array:
    """(T, 2) [start, end) ranges from a tile-sorted id stream
    (forward.cu:148-169).

    Pass `num_tiles` (a static int, e.g. tb_x * tb_y) to make this
    jittable — the tile count then never touches the host. Without it,
    T is derived from the data with a host sync (legacy behavior, not
    jittable)."""
    tile_ids = isect_ids_sorted[..., 0] if isect_ids_sorted.ndim == 2 else (
        isect_ids_sorted
    )
    if num_tiles is None:
        num_tiles = (
            int(jnp.max(tile_ids[:num_intersects])) + 1 if num_intersects else 0
        )
    tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
    start = jnp.searchsorted(tile_ids, tile_range, side="left")
    end = jnp.searchsorted(tile_ids, tile_range, side="right")
    return jnp.stack([start, end], axis=-1).astype(jnp.int32)


def _proj_like(xys, depths, radii, num_tiles_hit, height, width):
    """Rebuild the tile bboxes binning needs from gsplat-style inputs."""
    tb_x, tb_y = num_tiles(height, width)
    r = radii.astype(jnp.float32)
    tcx = xys[:, 0] / 16.0
    tcy = xys[:, 1] / 16.0
    tmin_x = jnp.clip((tcx - r / 16.0).astype(jnp.int32), 0, tb_x)
    tmax_x = jnp.clip((tcx + r / 16.0 + 1.0).astype(jnp.int32), 0, tb_x)
    tmin_y = jnp.clip((tcy - r / 16.0).astype(jnp.int32), 0, tb_y)
    tmax_y = jnp.clip((tcy + r / 16.0 + 1.0).astype(jnp.int32), 0, tb_y)
    return ProjectedGaussians(
        xys=xys,
        depths=depths,
        cam_depths=depths,
        radii=radii,
        conics=jnp.zeros((xys.shape[0], 3), jnp.float32),
        cov2d=jnp.zeros((xys.shape[0], 3), jnp.float32),
        num_tiles_hit=num_tiles_hit,
        tile_min=jnp.stack([tmin_x, tmin_y], axis=-1),
        tile_max=jnp.stack([tmax_x, tmax_y], axis=-1),
        mask=radii > 0,
    )
