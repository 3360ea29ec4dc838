"""EWA 3D->2D Gaussian projection, vectorized pure jnp.

One fused map over the (fixed-capacity) Gaussian axis: near-plane cull,
quat->R->cov3d, EWA cov3d->cov2d with FOV clamping and the +0.3 pixel blur,
conic + 3-sigma radius via 2x2 eigenvalues, NDC->pixel center, and the
per-Gaussian tile bounding box. Gradients come from jax autodiff (the
reference's hand-written projection VJPs in backward.cu:357-542 compute the
same chain rule).

Semantics are anchored to the reference kernels:
  - GPU path: forward.cu:19-103 + helpers.cuh (near cull, det==0 reject,
    pixel center 0.5*W*x + cx - 0.5, rw = 1/(w + 1e-6))
  - CPU path: gsplat-cpu/gsplat_cpu.cpp:48-131 (no near cull,
    det clamped to 1e-6, principal point fixed at image center,
    rw = 1/max(w, 1e-6))

The CPU flavor exists for conformance testing against the NumPy oracle;
the GPU flavor is what training uses (it matches the reference's CUDA
training path). Dead capacity slots are masked out via `valid_mask`.

TPU notes: everything here is elementwise/small-matmul over N and fuses
into a handful of VPU loops under XLA; there is no benefit to a custom
Pallas kernel for this stage (the rasterizer dominates).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .tensor_math import quat_to_rotmat

BLOCK_X = 16  # tile geometry, shared with the rasterizer (config.h:1-4)
BLOCK_Y = 16


class ProjectedGaussians(NamedTuple):
    xys: jax.Array  # (N, 2) pixel-space centers
    depths: jax.Array  # (N,) camera-space z (GPU-path sort key)
    cam_depths: jax.Array  # (N,) NDC z (CPU-path sort key)
    radii: jax.Array  # (N,) int32, 0 for culled
    conics: jax.Array  # (N, 3) upper-tri inverse cov2d
    cov2d: jax.Array  # (N, 3) upper-tri cov2d (for CPU-oracle bboxes)
    num_tiles_hit: jax.Array  # (N,) int32 tile-bbox area
    tile_min: jax.Array  # (N, 2) int32 inclusive tile bbox min (x, y)
    tile_max: jax.Array  # (N, 2) int32 exclusive tile bbox max (x, y)
    mask: jax.Array  # (N,) bool visibility


def project_gaussians(
    means: jax.Array,
    scales: jax.Array,
    glob_scale: float,
    quats: jax.Array,
    viewmat: jax.Array,
    projmat: jax.Array,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    img_height: int,
    img_width: int,
    clip_thresh: float = 0.01,
    mode: str = "gpu",
    valid_mask: Optional[jax.Array] = None,
    opacities: Optional[jax.Array] = None,
    alpha_thresh: float = 1.0 / 255.0,
    fov_width: Optional[int] = None,
    fov_height: Optional[int] = None,
) -> ProjectedGaussians:
    """Project N 3D Gaussians to 2D screen space.

    means: (N, 3); scales: (N, 3) (already exponentiated); quats: (N, 4) wxyz
    viewmat: (4, 4) world->camera; projmat: (4, 4) full projection
    (perspective @ viewmat, row-major application p' = projmat @ [p, 1]).
    """
    if mode not in ("gpu", "cpu"):
        raise ValueError(f"unknown projection mode {mode!r}")
    f32 = jnp.float32
    means = means.astype(f32)
    n = means.shape[0]

    R_vm = viewmat[:3, :3]
    t_vm = viewmat[:3, 3]
    p_view = means @ R_vm.T + t_vm  # (N, 3) camera-space
    z = p_view[:, 2]

    # --- EWA cov2d, fully elementwise over N (no (N,2,3)/(N,3,3) batched
    # matmuls: XLA's tiny-batched-dot lowering on v5e is ~2x slower than
    # the expanded scalar math, and the stacks add layout copies).
    # cov2d = T cov3d T^T = V V^T with V = T M, T = J R_vm,
    # M = R * glob_scale * diag(scales).
    # fov_width/fov_height let a BAND of a larger image render with the
    # full image's EWA clamp limits (parallel/gaussian_shard.py): the
    # 1.3x-fov ty/tx clamp must match the full-frame render or gaussians
    # beyond the band's own (smaller) fov get different cov2d
    tan_fovx = 0.5 * (fov_width if fov_width is not None else img_width) / fx
    tan_fovy = 0.5 * (fov_height if fov_height is not None else img_height) / fy
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    # guard z==0 for dead/behind slots; they are masked out downstream
    z_safe = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    tx = z * jnp.clip(p_view[:, 0] / z_safe, -lim_x, lim_x)
    ty = z * jnp.clip(p_view[:, 1] / z_safe, -lim_y, lim_y)
    rz = 1.0 / z_safe
    rz2 = rz * rz

    # J = [[fx rz, 0, -fx tx rz^2], [0, fy rz, -fy ty rz^2]]
    j00 = fx * rz
    j02 = -fx * tx * rz2
    j11 = fy * rz
    j12 = -fy * ty * rz2
    # T = J @ R_vm: rows from R_vm rows 0/1/2 (R_vm is shared, (3,3))
    t_row0 = [j00 * R_vm[0, k] + j02 * R_vm[2, k] for k in range(3)]
    t_row1 = [j11 * R_vm[1, k] + j12 * R_vm[2, k] for k in range(3)]

    R = quat_to_rotmat(quats)  # (N, 3, 3)
    s_cols = [glob_scale * scales[:, j] for j in range(3)]
    # V[r, j] = sum_k T[r, k] * M[k, j], M[k, j] = R[:, k, j] * s_j
    v0 = [
        (t_row0[0] * R[:, 0, j] + t_row0[1] * R[:, 1, j] + t_row0[2] * R[:, 2, j])
        * s_cols[j]
        for j in range(3)
    ]
    v1 = [
        (t_row1[0] * R[:, 0, j] + t_row1[1] * R[:, 1, j] + t_row1[2] * R[:, 2, j])
        * s_cols[j]
        for j in range(3)
    ]
    a = v0[0] * v0[0] + v0[1] * v0[1] + v0[2] * v0[2] + 0.3
    b_off = v0[0] * v1[0] + v0[1] * v1[1] + v0[2] * v1[2]
    c = v1[0] * v1[0] + v1[1] * v1[1] + v1[2] * v1[2] + 0.3

    det = a * c - b_off * b_off
    if mode == "cpu":
        det_ok = jnp.ones((n,), bool)
        det = jnp.maximum(det, 1e-6)
    else:
        det_ok = det != 0.0
        det = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / det
    conics = jnp.stack([c * inv_det, -b_off * inv_det, a * inv_det], axis=-1)

    mid = 0.5 * (a + c)
    sq = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    v_max = mid + sq  # >= mid - sq always
    radius_f = jnp.ceil(3.0 * jnp.sqrt(v_max))

    # --- pixel-space center via full projection matrix
    p_hom = means @ projmat[:, :3].T + projmat[:, 3]  # (N, 4)
    w_hom = p_hom[:, 3]
    if mode == "cpu":
        rw = 1.0 / jnp.maximum(w_hom, 1e-6)
    else:
        rw = 1.0 / (w_hom + 1e-6)
    p_proj = p_hom[:, :3] * rw[:, None]
    if mode == "cpu":
        # principal point pinned to image center (gsplat_cpu.cpp:123-124)
        u = 0.5 * ((p_proj[:, 0] + 1.0) * img_width - 1.0)
        v = 0.5 * ((p_proj[:, 1] + 1.0) * img_height - 1.0)
    else:
        u = 0.5 * img_width * p_proj[:, 0] + cx - 0.5
        v = 0.5 * img_height * p_proj[:, 1] + cy - 0.5
    xys = jnp.stack([u, v], axis=-1)

    # --- tile bbox (GPU path; helpers.cuh get_tile_bbox/get_bbox)
    tb_x = (img_width + BLOCK_X - 1) // BLOCK_X
    tb_y = (img_height + BLOCK_Y - 1) // BLOCK_Y
    tcx = u / BLOCK_X
    tcy = v / BLOCK_Y

    # Opacity-aware bbox radius (binning only — `radii` stays the
    # reference's 3-sigma value, helpers.cuh:51-74, so visibility and
    # densify stats keep exact parity): pixels with |d| >
    # sqrt(2 ln(op/alpha_thresh) lambda_max) can never reach the
    # rasterizer's alpha >= alpha_thresh test (forward.cu:343-345), so
    # the tile bbox needs only that radius. At op=0.1 this is 2.55 sigma
    # vs 3 sigma — a ~28% smaller bbox area; the emitted intersection
    # stream shrinks with identical output. +1 px absorbs f32 rounding.
    if opacities is not None:
        s_max = jnp.log(
            jnp.maximum(opacities.reshape(-1), 1e-12) / alpha_thresh
        )
        r_alpha = jnp.sqrt(2.0 * jnp.maximum(s_max, 0.0) * v_max) + 1.0
        bbox_radius = jnp.where(
            s_max > 0.0, jnp.minimum(radius_f, jnp.ceil(r_alpha)), 0.0
        )
    else:
        bbox_radius = radius_f

    def tile_bbox(r):
        trx = r / BLOCK_X
        try_ = r / BLOCK_Y
        # (int) cast truncates; negative values clamp to 0 either way
        tmin_x = jnp.clip((tcx - trx).astype(jnp.int32), 0, tb_x)
        tmax_x = jnp.clip((tcx + trx + 1.0).astype(jnp.int32), 0, tb_x)
        tmin_y = jnp.clip((tcy - try_).astype(jnp.int32), 0, tb_y)
        tmax_y = jnp.clip((tcy + try_ + 1.0).astype(jnp.int32), 0, tb_y)
        return tmin_x, tmax_x, tmin_y, tmax_y

    tmin_x, tmax_x, tmin_y, tmax_y = tile_bbox(bbox_radius)
    tile_area = (tmax_x - tmin_x) * (tmax_y - tmin_y)
    if opacities is None:
        vis_area = tile_area
    else:
        # visibility gate uses the reference's 3-sigma bbox so `mask`
        # and `radii` are unchanged by the opacity-aware tightening
        v0, v1, v2, v3 = tile_bbox(radius_f)
        vis_area = (v1 - v0) * (v3 - v2)

    mask = jnp.ones((n,), bool)
    if mode == "gpu":
        mask = mask & (z > clip_thresh) & det_ok & (vis_area > 0)
    if valid_mask is not None:
        mask = mask & valid_mask

    radii = jnp.where(mask, radius_f.astype(jnp.int32), 0)
    num_tiles_hit = jnp.where(mask, tile_area, 0).astype(jnp.int32)

    return ProjectedGaussians(
        xys=xys,
        depths=z,
        cam_depths=p_proj[:, 2],
        radii=radii,
        conics=conics,
        cov2d=jnp.stack([a, b_off, c], axis=-1),
        num_tiles_hit=num_tiles_hit,
        tile_min=jnp.stack([tmin_x, tmin_y], axis=-1),
        tile_max=jnp.stack([tmax_x, tmax_y], axis=-1),
        mask=mask,
    )


def compute_cov2d_bounds(cov2d: jax.Array):
    """(conics, radii, valid) from packed 2D covariances (N, 3) = (a, b, c).

    Standalone utility matching the reference's compute_cov2d_bounds_tensor
    (bindings.cu:46-66, helpers.cuh:51-74): conic = inverse covariance,
    radius = ceil(3 sigma_max) from the eigenvalue bound, valid = det != 0.
    """
    a, b, c = cov2d[:, 0], cov2d[:, 1], cov2d[:, 2]
    det = a * c - b * b
    valid = det != 0.0
    det_safe = jnp.where(valid, det, 1.0)
    inv_det = 1.0 / det_safe
    conics = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)
    conics = jnp.where(valid[:, None], conics, 0.0)
    mid = 0.5 * (a + c)
    sq = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radii = jnp.ceil(3.0 * jnp.sqrt(mid + sq))
    radii = jnp.where(valid, radii, 0.0)
    return conics, radii, valid
