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


def test_opacity_aware_bbox_is_subset_and_render_identical():
    """Opacity-aware tile bboxes must (a) leave radii/mask untouched,
    (b) shrink (never grow) the bbox, and (c) keep the tiled render
    unchanged up to fp summation reordering — dropped tiles can never
    pass the alpha >= 1/255 test (forward.cu:343-345), but removing
    their no-op records shifts chunk boundaries."""
    from opensplat_tpu.ops.rasterize_tiled import rasterize_tiled

    s = make_scene(n=200, seed=13)
    rng = np.random.default_rng(5)
    opac = rng.uniform(0.005, 0.6, (200,)).astype(np.float32)
    args = (
        jnp.asarray(s["means"]), jnp.asarray(s["scales"]), 1.0,
        jnp.asarray(s["quats"]), jnp.asarray(s["viewmat"]),
        jnp.asarray(s["projmat"]), s["fx"], s["fy"], s["cx"], s["cy"],
        s["H"], s["W"],
    )
    base = project_gaussians(*args, mode="gpu")
    tight = project_gaussians(*args, mode="gpu", opacities=jnp.asarray(opac))

    np.testing.assert_array_equal(np.asarray(base.radii), np.asarray(tight.radii))
    np.testing.assert_array_equal(np.asarray(base.mask), np.asarray(tight.mask))
    assert (np.asarray(tight.tile_min) >= np.asarray(base.tile_min)).all()
    assert (np.asarray(tight.tile_max) <= np.asarray(base.tile_max)).all()
    assert (
        np.asarray(tight.num_tiles_hit).sum()
        < np.asarray(base.num_tiles_hit).sum()
    )

    def render(proj):
        img, ft = rasterize_tiled(
            proj.xys, proj.conics, jnp.asarray(s["colors"]),
            jnp.asarray(opac), proj.depths, proj.radii,
            proj.num_tiles_hit, proj.tile_min, proj.tile_max,
            jnp.asarray(s["background"]), s["H"], s["W"],
        )
        return np.asarray(img), np.asarray(ft)

    img_b, ft_b = render(base)
    img_t, ft_t = render(tight)
    np.testing.assert_allclose(img_t, img_b, atol=1e-5)
    np.testing.assert_allclose(ft_t, ft_b, atol=1e-5)


def test_rotation_matrix_parity():
    """rotationMatrix(a, b) parity (tensor_math.cpp:47-68): carries a
    onto b, handles the anti-parallel degenerate case."""
    from opensplat_tpu.ops.tensor_math import rotation_matrix

    rng = np.random.default_rng(7)
    for _ in range(10):
        a = rng.normal(size=3)
        b = rng.normal(size=3)
        a = a / np.linalg.norm(a)
        b = b / np.linalg.norm(b)
        r = rotation_matrix(a, b)
        np.testing.assert_allclose(r @ a, b, atol=1e-5)
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    a = np.array([0.0, 0.0, 1.0])
    r = rotation_matrix(a, -a)
    np.testing.assert_allclose(r @ a, -a, atol=1e-6)
