"""Geometry helpers (quaternion / pose math), pure jnp.

Semantics anchored to the reference implementation:
  - quat_to_rotmat .............. /root/reference/tensor_math.cpp:5-28
  - random_quat ................. /root/reference/model.cpp:23-33
  - auto_scale_and_center_poses . /root/reference/tensor_math.cpp:30-44
  - rodrigues_to_rotation ....... /root/reference/tensor_math.cpp:70-92

These are re-implemented from the mathematical spec, vectorized over a
leading batch axis, and jit/grad-safe (no data-dependent control flow).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def quat_to_rotmat(quat: jax.Array) -> jax.Array:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix.

    Normalizes the quaternion first (the reference does the same).
    """
    q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    row0 = jnp.stack([r00, r01, r02], axis=-1)
    row1 = jnp.stack([r10, r11, r12], axis=-1)
    row2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def random_quat(key: jax.Array, n: int) -> jax.Array:
    """n uniformly-distributed unit quaternions, (n, 4) wxyz.

    Same construction (Shoemake) as reference model.cpp:23-33.
    """
    ku, kv, kw = jax.random.split(key, 3)
    u = jax.random.uniform(ku, (n,))
    v = jax.random.uniform(kv, (n,))
    w = jax.random.uniform(kw, (n,))
    two_pi = 2.0 * jnp.pi
    return jnp.stack(
        [
            jnp.sqrt(1.0 - u) * jnp.sin(two_pi * v),
            jnp.sqrt(1.0 - u) * jnp.cos(two_pi * v),
            jnp.sqrt(u) * jnp.sin(two_pi * w),
            jnp.sqrt(u) * jnp.cos(two_pi * w),
        ],
        axis=-1,
    )


def auto_scale_and_center_poses(poses: np.ndarray):
    """Center camera origins at their mean; scale so max |coord| == 1.

    poses: (C, 4, 4) camera-to-world matrices (numpy, host-side).
    Returns (transformed_poses, translation(3,), scale float).
    Reference: tensor_math.cpp:30-44. The returned (translation, scale) is
    the global CRS transform reused by PLY export and cameras.json.
    """
    poses = np.asarray(poses, dtype=np.float32).copy()
    origins = poses[..., :3, 3]
    center = origins.mean(axis=0)
    origins = origins - center
    f = 1.0 / np.abs(origins).max()
    poses[..., :3, 3] = origins * f
    return poses, center, float(f)


def rodrigues_to_rotation(rodrigues: np.ndarray) -> np.ndarray:
    """Axis-angle (3,) -> rotation matrix (3, 3). Host-side numpy.

    Reference: tensor_math.cpp:70-92 (used by the OpenSFM loader).
    """
    r = np.asarray(rodrigues, dtype=np.float32)
    theta = float(np.linalg.norm(r))
    if theta < 1e-9:
        return np.eye(3, dtype=np.float32)
    k = r / theta
    K = np.array(
        [
            [0.0, -k[2], k[1]],
            [k[2], 0.0, -k[0]],
            [-k[1], k[0], 0.0],
        ],
        dtype=np.float32,
    )
    rrT = np.outer(k, k).astype(np.float32)
    c = np.cos(theta)
    return (c * np.eye(3, dtype=np.float32) + (1.0 - c) * rrT + np.sin(theta) * K).astype(
        np.float32
    )


def _part1by2_np(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) & 0x3FF
    x = (x | (x << 16)) & np.uint64(0x30000FF)
    x = (x | (x << 8)) & np.uint64(0x300F00F)
    x = (x | (x << 4)) & np.uint64(0x30C30C3)
    x = (x | (x << 2)) & np.uint64(0x9249249)
    return x


def morton_order(points: np.ndarray) -> np.ndarray:
    """Permutation sorting points along a 3D Morton (Z-order) curve.

    Spatially-nearby Gaussians become memory-adjacent, which makes the
    per-intersection record gathers index-coherent — measured ~2x faster
    than random order on v5e (PERF.md). Host-side numpy; used at model
    init and by the jitted refine-time reorder's oracle tests.
    """
    lo = points.min(axis=0)
    span = points.max(axis=0) - lo
    span[span == 0] = 1.0
    q = np.clip((points - lo) / span * 1023.0, 0, 1023).astype(np.uint32)
    key = (
        _part1by2_np(q[:, 0])
        | (_part1by2_np(q[:, 1]) << 1)
        | (_part1by2_np(q[:, 2]) << 2)
    )
    return np.argsort(key, kind="stable")


def rotation_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Rotation carrying unit-direction `a` onto `b` (Rodrigues form).

    Parity with the reference's rotationMatrix (tensor_math.cpp:47-68;
    defined there but unused by the trainer). Degenerate anti-parallel
    input falls back to a 180-degree rotation about an orthogonal axis.
    """
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    v = np.cross(a, b)
    c = float(np.dot(a, b))
    if c < -1.0 + 1e-8:
        # 180 degrees: rotate about any axis orthogonal to a
        axis = np.cross(a, [1.0, 0.0, 0.0])
        if np.linalg.norm(axis) < 1e-8:
            axis = np.cross(a, [0.0, 1.0, 0.0])
        axis /= np.linalg.norm(axis)
        return rodrigues_to_rotation(axis * np.pi).astype(np.float32)
    k = np.array([
        [0.0, -v[2], v[1]],
        [v[2], 0.0, -v[0]],
        [-v[1], v[0], 0.0],
    ])
    r = np.eye(3) + k + k @ k * (1.0 / (1.0 + c))
    return r.astype(np.float32)
