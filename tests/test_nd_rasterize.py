"""Channel-generic (nd_) rasterization on the FAST (tiled) path vs the
dense conformance renderer — the reference's production nd kernels
(forward.cu:174-254, backward.cu:15-129) rasterize arbitrary channel
counts; these tests pin the same capability on the tiled production
renderer (gsplat_compat.nd_rasterize_forward/backward) for CH=4 feature
planes and CH=1 depth maps (models.splat_model.render_depth).

Tolerances match test_rasterize_tiled.py: the tile path composites only
within ceil(3 sigma) tile bboxes while dense evaluates every pixel, so
per-pixel deviations are bounded the same way the reference's own
CPU/CUDA backends deviate."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opensplat_tpu.gsplat_compat import (
    nd_rasterize_backward,
    nd_rasterize_forward,
)
from opensplat_tpu.ops import project_gaussians
from opensplat_tpu.ops.rasterize import rasterize
from scene_utils import make_scene


def _setup(n=400, seed=2, ch=4):
    s = make_scene(n=n, seed=seed)
    rng = np.random.default_rng(seed + 100)
    s["colors_nd"] = rng.uniform(0.0, 1.0, (n, ch)).astype(np.float32)
    s["background_nd"] = rng.uniform(0.0, 1.0, (ch,)).astype(np.float32)
    proj = project_gaussians(
        jnp.asarray(s["means"]), jnp.asarray(s["scales"]), 1.0,
        jnp.asarray(s["quats"]), jnp.asarray(s["viewmat"]),
        jnp.asarray(s["projmat"]),
        s["fx"], s["fy"], s["cx"], s["cy"], s["H"], s["W"], mode="gpu",
    )
    return s, proj


def _nd_args(s, proj):
    return (
        proj.xys, proj.depths, proj.radii, proj.conics, proj.num_tiles_hit,
        jnp.asarray(s["colors_nd"]), jnp.asarray(s["opacities"]),
        s["H"], s["W"], jnp.asarray(s["background_nd"]),
    )


@pytest.mark.parametrize("ch,seed", [(4, 2), (4, 7), (1, 3), (2, 5)])
def test_nd_forward_matches_dense(ch, seed):
    s, proj = _setup(400, seed, ch)
    img_t, ft_t = nd_rasterize_forward(*_nd_args(s, proj))
    assert img_t.shape == (s["H"], s["W"], ch)
    img_d, ft_d = rasterize(
        proj.xys, proj.conics, jnp.asarray(s["colors_nd"]),
        jnp.asarray(s["opacities"]), proj.depths, proj.mask,
        jnp.asarray(s["background_nd"]), s["H"], s["W"],
    )
    d = np.abs(np.asarray(img_t) - np.asarray(img_d)).max(-1)
    assert (d <= 1e-3).mean() >= 0.98, f"{(d > 1e-3).mean():.4f} of pixels off"
    assert d.max() <= 3e-2, f"max diff {d.max()}"
    assert np.abs(np.asarray(ft_t) - np.asarray(ft_d)).max() <= 3e-2


def test_nd_backward_matches_dense():
    ch = 4
    s, proj = _setup(400, 3, ch)
    rng = np.random.default_rng(0)
    v_img = jnp.asarray(rng.normal(size=(s["H"], s["W"], ch)).astype(np.float32))
    v_ft = jnp.asarray(rng.normal(size=(s["H"], s["W"])).astype(np.float32))

    g_t = nd_rasterize_backward(
        proj.xys, proj.depths, proj.radii, proj.conics, proj.num_tiles_hit,
        jnp.asarray(s["colors_nd"]), jnp.asarray(s["opacities"]),
        s["H"], s["W"], jnp.asarray(s["background_nd"]), v_img, v_ft,
    )

    def dense_f(xys, con, col, op):
        return rasterize(
            xys, con, col, op, proj.depths, proj.mask,
            jnp.asarray(s["background_nd"]), s["H"], s["W"],
        )

    _, vjp_d = jax.vjp(
        dense_f, proj.xys, proj.conics, jnp.asarray(s["colors_nd"]),
        jnp.asarray(s["opacities"]),
    )
    g_d = vjp_d((v_img, v_ft))
    names = ("v_xy", "v_conic", "v_colors", "v_opacity")
    for name, gt, gd in zip(names, g_t, g_d):
        gt, gd = np.asarray(gt), np.asarray(gd)
        scale = np.abs(gd).max() + 1e-6
        np.testing.assert_allclose(
            gt / scale, gd / scale, atol=5e-3, err_msg=name
        )


def test_render_depth_matches_dense_composite():
    """render_depth (tiled CH=1 fast path) vs a dense composite of the
    same projection's camera depths."""
    from opensplat_tpu.models.gaussians import init_model
    from opensplat_tpu.models.splat_model import render_depth
    from opensplat_tpu.ops.camera import camera_matrices

    rng = np.random.default_rng(11)
    n = 300
    pts = np.concatenate(
        [rng.uniform(-1.0, 1.0, (n, 2)), rng.uniform(-8.0, -4.0, (n, 1))],
        axis=-1,
    ).astype(np.float32)
    rgb = rng.integers(0, 255, (n, 3)).astype(np.uint8)
    state = init_model(pts, rgb, sh_degree=1, capacity=512, seed=0)
    h = w = 64
    fx = fy = 80.0
    c2w = jnp.eye(4, dtype=jnp.float32)

    depth, alpha = render_depth(
        state.params, state.alive, c2w, fx, fy, w / 2.0, h / 2.0, h, w,
        mode="accumulated",
    )
    assert depth.shape == (h, w) and alpha.shape == (h, w)

    viewmat, full_proj, _ = camera_matrices(c2w, fx, fy, w, h)
    proj = project_gaussians(
        state.params.means, jnp.exp(state.params.scales), 1.0,
        state.params.quats / jnp.linalg.norm(
            state.params.quats, axis=-1, keepdims=True
        ),
        viewmat, full_proj, fx, fy, w / 2.0, h / 2.0, h, w,
        mode="gpu", valid_mask=state.alive,
    )
    acc_d, ft_d = rasterize(
        proj.xys, proj.conics, proj.depths[:, None],
        jax.nn.sigmoid(state.params.opacities), proj.depths, proj.mask,
        jnp.zeros((1,), jnp.float32), h, w,
    )
    d = np.abs(np.asarray(depth) - np.asarray(acc_d)[..., 0])
    rel = d / (np.abs(np.asarray(acc_d)[..., 0]) + 1e-3)
    assert (rel <= 1e-3).mean() >= 0.98, f"{(rel > 1e-3).mean():.4f} off"
    assert np.abs(
        np.asarray(alpha) - (1.0 - np.asarray(ft_d))
    ).max() <= 3e-2

    # something was actually hit, and depths land in the camera range
    a = np.asarray(alpha)
    dep = np.asarray(depth)
    assert a.max() > 0.5
    assert 3.0 <= dep[a > 0.9].mean() / max(a[a > 0.9].mean(), 1e-6) <= 9.0

    # expected-depth mode normalizes by alpha
    depth_e, _ = render_depth(
        state.params, state.alive, c2w, fx, fy, w / 2.0, h / 2.0, h, w,
        mode="expected",
    )
    de = np.asarray(depth_e)
    assert 3.9 <= de[a > 0.9].mean() <= 8.1

    # differentiable: depth gradient flows back to the means
    def loss(means):
        p = state.params.replace(means=means)
        dd, _ = render_depth(
            p, state.alive, c2w, fx, fy, w / 2.0, h / 2.0, h, w,
            mode="accumulated",
        )
        return jnp.sum(dd)

    g = jax.grad(loss)(state.params.means)
    assert bool(jnp.all(jnp.isfinite(g))) and float(
        jnp.abs(g).max()
    ) > 0.0
