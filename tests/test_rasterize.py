"""Rasterizer conformance: forward image and all gradient streams must match
the NumPy oracle (reference gsplat-cpu semantics, gsplat_cpu.cpp:137-376).

Exact float32 equality is impossible across implementations because the
compositing has hard thresholds (alpha >= 1/255, T <= 1e-4): a 1-ulp
difference in exp() flips a Gaussian in/out of a pixel's composited set —
the reference's own CUDA and CPU backends differ the same way. The tests
therefore assert (a) the bulk of pixels/gradient entries agree tightly and
(b) the worst-case deviation is bounded by the effect of a single
threshold flip.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opensplat_tpu.ops.rasterize import rasterize
from opensplat_tpu.oracle import (
    np_project_gaussians,
    np_rasterize_forward,
    np_rasterize_backward,
)
from scene_utils import make_scene


def _project(s):
    return np_project_gaussians(
        s["means"], s["scales"], 1.0, s["quats"], s["viewmat"], s["projmat"],
        s["fx"], s["fy"], s["cx"], s["cy"], s["H"], s["W"],
    )


def _assert_bulk_close(got, want, rel_tol=1e-3, bulk=0.99, max_rel=0.05, name=""):
    got = np.asarray(got).reshape(np.shape(want))
    want = np.asarray(want)
    scale = np.abs(want).max() + 1e-12
    denom = np.maximum(np.abs(want), 1e-3 * scale)
    rel = np.abs(got - want) / denom
    frac_ok = (rel <= rel_tol).mean()
    assert frac_ok >= bulk, f"{name}: only {frac_ok:.4f} within rtol {rel_tol}"
    assert rel.max() <= max_rel, f"{name}: max rel err {rel.max():.4f}"
    n1, n2 = np.linalg.norm(got), np.linalg.norm(want)
    assert abs(n1 - n2) <= 2e-3 * max(n2, 1e-12), f"{name}: norm mismatch {n1} vs {n2}"


@pytest.mark.parametrize("seed,n", [(0, 300), (5, 64), (9, 900)])
def test_forward_matches_oracle(seed, n):
    s = make_scene(n=n, seed=seed)
    xys, radii, conics, cov2d, cam_depths = _project(s)
    want_img, want_T, _ = np_rasterize_forward(
        s["W"], s["H"], xys, conics, s["colors"], s["opacities"],
        s["background"], cov2d, cam_depths,
    )
    img, final_t = rasterize(
        jnp.asarray(xys), jnp.asarray(conics), jnp.asarray(s["colors"]),
        jnp.asarray(s["opacities"]), jnp.asarray(cam_depths),
        jnp.ones(n, bool), jnp.asarray(s["background"]), s["H"], s["W"],
    )
    img = np.asarray(img)
    d = np.abs(img - want_img).max(axis=-1)
    assert (d <= 1e-4).mean() >= 0.99, f"{(d > 1e-4).mean():.4f} of pixels off"
    assert d.max() <= 1e-2, f"max pixel diff {d.max()}"
    dT = np.abs(np.asarray(final_t) - want_T)
    assert (dT <= 1e-5).mean() >= 0.99
    assert dT.max() <= 5e-3


def test_backward_matches_oracle():
    s = make_scene(n=300, seed=3)
    n = 300
    xys, radii, conics, cov2d, cam_depths = _project(s)
    img_o, T_o, px2gid = np_rasterize_forward(
        s["W"], s["H"], xys, conics, s["colors"], s["opacities"],
        s["background"], cov2d, cam_depths,
    )
    rng = np.random.default_rng(42)
    v_out = rng.normal(size=(s["H"], s["W"], 3)).astype(np.float32)
    v_oa = rng.normal(size=(s["H"], s["W"])).astype(np.float32)
    want = np_rasterize_backward(
        s["H"], s["W"], xys, conics, s["colors"], s["opacities"],
        s["background"], T_o, px2gid, v_out, v_oa,
    )

    out, vjp_fn = jax.vjp(
        lambda a, b, c, d, e: rasterize(
            a, b, c, d, jnp.asarray(cam_depths), jnp.ones(n, bool), e, s["H"], s["W"]
        ),
        jnp.asarray(xys), jnp.asarray(conics), jnp.asarray(s["colors"]),
        jnp.asarray(s["opacities"]), jnp.asarray(s["background"]),
    )
    # the oracle's v_output_alpha is the cotangent of out_alpha = 1 - final_T;
    # our second output is final_T itself, so its cotangent is -v_oa
    g_xys, g_conics, g_colors, g_opac, g_bg = vjp_fn(
        (jnp.asarray(v_out), -jnp.asarray(v_oa))
    )

    _assert_bulk_close(g_xys, want[0], name="v_xy")
    _assert_bulk_close(g_conics, want[1], name="v_conic")
    _assert_bulk_close(g_colors, want[2], name="v_colors")
    _assert_bulk_close(g_opac, want[3], name="v_opacity")
    # exact background gradient: v_bg = sum_p T_final * v_out
    want_bg = (T_o[..., None] * v_out).sum((0, 1))
    np.testing.assert_allclose(np.asarray(g_bg), want_bg, rtol=1e-3, atol=1e-3)


def test_invalid_gaussians_ignored():
    s = make_scene(n=100, seed=11)
    xys, radii, conics, cov2d, cam_depths = _project(s)
    valid = np.ones(100, bool)
    valid[40:] = False
    img1, _ = rasterize(
        jnp.asarray(xys), jnp.asarray(conics), jnp.asarray(s["colors"]),
        jnp.asarray(s["opacities"]), jnp.asarray(cam_depths),
        jnp.asarray(valid), jnp.asarray(s["background"]), s["H"], s["W"],
    )
    img2, _ = rasterize(
        jnp.asarray(xys[:40]), jnp.asarray(conics[:40]), jnp.asarray(s["colors"][:40]),
        jnp.asarray(s["opacities"][:40]), jnp.asarray(cam_depths[:40]),
        jnp.ones(40, bool), jnp.asarray(s["background"]), s["H"], s["W"],
    )
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2), rtol=1e-5, atol=1e-6)


def test_empty_scene_renders_background():
    s = make_scene(n=8, seed=0)
    img, final_t = rasterize(
        jnp.zeros((8, 2)), jnp.zeros((8, 3)), jnp.zeros((8, 3)),
        jnp.zeros(8), jnp.zeros(8), jnp.zeros(8, bool),
        jnp.asarray(s["background"]), 16, 16,
    )
    np.testing.assert_allclose(
        np.asarray(img), np.broadcast_to(s["background"], (16, 16, 3)), atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(final_t), np.ones((16, 16)), atol=1e-7)


def test_nd_rasterize_generic_channels():
    """Channels beyond 3 composite independently; first 3 match the RGB
    render (reference nd_rasterize semantics, forward.cu:174-254)."""
    import jax.numpy as jnp
    import numpy as np
    from opensplat_tpu.ops.rasterize import nd_rasterize, rasterize
    from tests.scene_utils import make_scene
    from opensplat_tpu.ops.projection import project_gaussians

    sc = make_scene(n=60, seed=4)
    pg = project_gaussians(
        jnp.asarray(sc["means"]), jnp.asarray(sc["scales"]), 1.0,
        jnp.asarray(sc["quats"]), jnp.asarray(sc["viewmat"]),
        jnp.asarray(sc["projmat"]), sc["fx"], sc["fy"], sc["cx"], sc["cy"],
        sc["H"], sc["W"],
    )
    rng = np.random.default_rng(0)
    extra = rng.uniform(0, 1, (60, 2)).astype(np.float32)
    cols5 = jnp.concatenate([jnp.asarray(sc["colors"]), jnp.asarray(extra)], 1)
    bg5 = jnp.concatenate([jnp.asarray(sc["background"]), jnp.zeros(2)])
    img5, ft5 = nd_rasterize(
        pg.xys, pg.conics, cols5, jnp.asarray(sc["opacities"]), pg.depths,
        pg.mask, bg5, sc["H"], sc["W"],
    )
    img3, ft3 = rasterize(
        pg.xys, pg.conics, jnp.asarray(sc["colors"]),
        jnp.asarray(sc["opacities"]), pg.depths, pg.mask,
        jnp.asarray(sc["background"]), sc["H"], sc["W"],
    )
    assert img5.shape == (sc["H"], sc["W"], 5)
    np.testing.assert_allclose(np.asarray(img5[..., :3]), np.asarray(img3),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ft5), np.asarray(ft3), rtol=1e-6)


def test_compute_cov2d_bounds():
    import jax.numpy as jnp
    import numpy as np
    from opensplat_tpu.ops.projection import compute_cov2d_bounds

    cov2d = jnp.asarray([[2.0, 0.3, 1.5], [1.0, 0.0, 1.0], [1.0, 1.0, 1.0]])
    conics, radii, valid = compute_cov2d_bounds(cov2d)
    assert bool(valid[0]) and bool(valid[1])
    assert not bool(valid[2])  # det == 0
    det = 2.0 * 1.5 - 0.09
    np.testing.assert_allclose(
        np.asarray(conics[0]), [1.5 / det, -0.3 / det, 2.0 / det], rtol=1e-6
    )
    # (1,0,1): det=1, mid=1, sq=sqrt(clamp(0.1, mid^2-det)) -> vmax=1+sqrt(0.1)
    expect = np.ceil(3.0 * np.sqrt(1.0 + np.sqrt(0.1)))
    np.testing.assert_allclose(float(radii[1]), expect, rtol=1e-6)
    assert float(radii[2]) == 0.0
