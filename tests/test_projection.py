"""Projection parity: jnp project_gaussians (cpu mode) vs the NumPy oracle."""
import numpy as np
import jax.numpy as jnp

from opensplat_tpu.ops import project_gaussians
from opensplat_tpu.oracle import np_project_gaussians
from scene_utils import make_scene


def test_projection_matches_oracle():
    s = make_scene(n=500, seed=1)
    out = project_gaussians(
        jnp.asarray(s["means"]),
        jnp.asarray(s["scales"]),
        1.0,
        jnp.asarray(s["quats"]),
        jnp.asarray(s["viewmat"]),
        jnp.asarray(s["projmat"]),
        s["fx"],
        s["fy"],
        s["cx"],
        s["cy"],
        s["H"],
        s["W"],
        mode="cpu",
    )
    xys, radii, conics, cov2d, cam_depths = np_project_gaussians(
        s["means"],
        s["scales"],
        1.0,
        s["quats"],
        s["viewmat"],
        s["projmat"],
        s["fx"],
        s["fy"],
        s["cx"],
        s["cy"],
        s["H"],
        s["W"],
    )
    np.testing.assert_allclose(np.asarray(out.xys), xys, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.conics), conics, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.cam_depths), cam_depths, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.radii), radii)
    cov_ut = np.stack([cov2d[:, 0, 0], cov2d[:, 0, 1], cov2d[:, 1, 1]], axis=-1)
    np.testing.assert_allclose(np.asarray(out.cov2d), cov_ut, rtol=1e-4, atol=1e-5)


def test_projection_gpu_mode_culls():
    s = make_scene(n=100, seed=2)
    means = s["means"].copy()
    means[:10, 2] = -5.0  # behind the camera
    out = project_gaussians(
        jnp.asarray(means),
        jnp.asarray(s["scales"]),
        1.0,
        jnp.asarray(s["quats"]),
        jnp.asarray(s["viewmat"]),
        jnp.asarray(s["projmat"]),
        s["fx"],
        s["fy"],
        s["cx"],
        s["cy"],
        s["H"],
        s["W"],
        mode="gpu",
    )
    mask = np.asarray(out.mask)
    assert not mask[:10].any()
    assert (np.asarray(out.radii)[:10] == 0).all()
    assert (np.asarray(out.num_tiles_hit)[:10] == 0).all()
    assert mask[10:].sum() > 50  # most in-frustum points survive
    # tile areas consistent with bboxes
    tmin = np.asarray(out.tile_min)
    tmax = np.asarray(out.tile_max)
    area = (tmax[:, 0] - tmin[:, 0]) * (tmax[:, 1] - tmin[:, 1])
    nth = np.asarray(out.num_tiles_hit)
    np.testing.assert_array_equal(nth[mask], area[mask])


def test_projection_valid_mask():
    s = make_scene(n=50, seed=3)
    alive = np.ones(50, bool)
    alive[::2] = False
    out = project_gaussians(
        jnp.asarray(s["means"]),
        jnp.asarray(s["scales"]),
        1.0,
        jnp.asarray(s["quats"]),
        jnp.asarray(s["viewmat"]),
        jnp.asarray(s["projmat"]),
        s["fx"],
        s["fy"],
        s["cx"],
        s["cy"],
        s["H"],
        s["W"],
        mode="gpu",
        valid_mask=jnp.asarray(alive),
    )
    assert (np.asarray(out.radii)[~alive] == 0).all()
