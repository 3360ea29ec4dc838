"""Shared synthetic-scene helpers for tests."""
import numpy as np


def make_scene(n=300, seed=0, spread=1.0, z_range=(4.0, 12.0)):
    """Random Gaussians in front of a simple look-at camera.

    Returns a dict of float32 numpy arrays + camera scalars.
    """
    rng = np.random.default_rng(seed)
    means = np.concatenate(
        [
            rng.uniform(-spread, spread, (n, 2)),
            rng.uniform(z_range[0], z_range[1], (n, 1)),
        ],
        axis=-1,
    ).astype(np.float32)
    scales = np.exp(rng.uniform(-2.5, -0.5, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opacities = (1.0 / (1.0 + np.exp(-rng.normal(0.0, 1.5, (n,))))).astype(np.float32)
    colors = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)

    H = W = 64
    fx = fy = 80.0
    cx, cy = W / 2.0, H / 2.0

    # camera at origin looking down +z (identity view), gsplat convention:
    # world == camera coordinates here
    viewmat = np.eye(4, dtype=np.float32)
    fovx = 2.0 * np.arctan(W / (2.0 * fx))
    fovy = 2.0 * np.arctan(H / (2.0 * fy))
    z_near, z_far = 0.001, 1000.0
    t = z_near * np.tan(0.5 * fovy)
    r = z_near * np.tan(0.5 * fovx)
    projmat = np.array(
        [
            [z_near / r, 0, 0, 0],
            [0, z_near / t, 0, 0],
            [0, 0, (z_far + z_near) / (z_far - z_near), -z_far * z_near / (z_far - z_near)],
            [0, 0, 1, 0],
        ],
        dtype=np.float32,
    )
    fullproj = projmat @ viewmat
    background = np.array([0.6130, 0.0101, 0.3984], np.float32)
    return dict(
        means=means,
        scales=scales,
        quats=quats,
        opacities=opacities,
        colors=colors,
        viewmat=viewmat,
        projmat=fullproj,
        fx=fx,
        fy=fy,
        cx=cx,
        cy=cy,
        H=H,
        W=W,
        background=background,
    )
