"""Camera matrix helpers (OpenGL-convention projection, gsplat view matrix).

Anchored to reference model.cpp:35-47 (projectionMatrix) and
model.cpp:83-113 (pose -> viewmat with the y/z axis flip).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Z_NEAR = 0.001
Z_FAR = 1000.0


def projection_matrix(z_near: float, z_far: float, fov_x, fov_y) -> jax.Array:
    """OpenGL perspective projection matrix, z in [near, far] mapped per
    the reference's convention (row 3 = [0,0,1,0]: w = view-space z)."""
    t = z_near * jnp.tan(0.5 * fov_y)
    b = -t
    r = z_near * jnp.tan(0.5 * fov_x)
    l = -r
    zeros = jnp.zeros(())
    one = jnp.ones(())
    row0 = jnp.stack([2.0 * z_near / (r - l), zeros, (r + l) / (r - l), zeros])
    row1 = jnp.stack([zeros, 2.0 * z_near / (t - b), (t + b) / (t - b), zeros])
    row2 = jnp.stack(
        [zeros, zeros, (z_far + z_near) * one / (z_far - z_near),
         -1.0 * z_far * z_near * one / (z_far - z_near)]
    )
    row3 = jnp.stack([zeros, zeros, one, zeros])
    return jnp.stack([row0, row1, row2, row3]).astype(jnp.float32)


def camera_matrices(cam_to_world: jax.Array, fx, fy, width: int, height: int):
    """Compute (viewmat, full_projmat, cam_pos) from a 4x4 camera-to-world
    pose, applying the gsplat y/z flip (model.cpp:93-113).

    cam_pos is the (3,) camera origin in world space BEFORE the flip — the
    reference uses it for SH view directions (model.cpp:176).
    """
    R = cam_to_world[:3, :3]
    T = cam_to_world[:3, 3]
    flip = jnp.diag(jnp.array([1.0, -1.0, -1.0], jnp.float32))
    Rf = R @ flip
    Rinv = Rf.T
    Tinv = -Rinv @ T
    viewmat = jnp.eye(4, dtype=jnp.float32)
    viewmat = viewmat.at[:3, :3].set(Rinv)
    viewmat = viewmat.at[:3, 3].set(Tinv)

    fov_x = 2.0 * jnp.arctan(width / (2.0 * fx))
    fov_y = 2.0 * jnp.arctan(height / (2.0 * fy))
    projmat = projection_matrix(Z_NEAR, Z_FAR, fov_x, fov_y)
    full_proj = projmat @ viewmat
    return viewmat, full_proj, T
