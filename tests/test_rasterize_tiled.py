"""Tiled (binned) rasterizer vs the dense conformance renderer.

Differences are bounded by the tile-bbox restriction: the CUDA-style tile
path only composites a Gaussian into tiles within its ceil(3 sigma) radius
bbox (forward.cu:87-94), while the dense renderer evaluates every pixel —
outside 3 sigma alpha <= ~0.011 * opacity, so per-pixel deviations are
small and the reference's own CPU/CUDA backends differ identically."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opensplat_tpu.ops import project_gaussians
from opensplat_tpu.ops.rasterize import rasterize
from opensplat_tpu.ops.rasterize_tiled import rasterize_tiled
from scene_utils import make_scene


def _setup(n=400, seed=2):
    s = make_scene(n=n, seed=seed)
    proj = project_gaussians(
        jnp.asarray(s["means"]), jnp.asarray(s["scales"]), 1.0,
        jnp.asarray(s["quats"]), jnp.asarray(s["viewmat"]), jnp.asarray(s["projmat"]),
        s["fx"], s["fy"], s["cx"], s["cy"], s["H"], s["W"], mode="gpu",
    )
    return s, proj


def _tiled(s, proj, n):
    return rasterize_tiled(
        proj.xys, proj.conics, jnp.asarray(s["colors"]),
        jnp.asarray(s["opacities"]), proj.depths, proj.radii,
        proj.num_tiles_hit, proj.tile_min, proj.tile_max,
        jnp.asarray(s["background"]), s["H"], s["W"],
    )


def _dense(s, proj, n):
    return rasterize(
        proj.xys, proj.conics, jnp.asarray(s["colors"]),
        jnp.asarray(s["opacities"]), proj.depths, proj.mask,
        jnp.asarray(s["background"]), s["H"], s["W"],
    )


@pytest.mark.parametrize("n,seed", [(400, 2), (64, 7), (900, 1)])
def test_tiled_forward_matches_dense(n, seed):
    s, proj = _setup(n, seed)
    img_t, ft_t = _tiled(s, proj, n)
    img_d, ft_d = _dense(s, proj, n)
    d = np.abs(np.asarray(img_t) - np.asarray(img_d)).max(-1)
    assert (d <= 1e-3).mean() >= 0.98, f"{(d > 1e-3).mean():.4f} of pixels off"
    assert d.max() <= 3e-2, f"max diff {d.max()}"
    dT = np.abs(np.asarray(ft_t) - np.asarray(ft_d))
    assert dT.max() <= 3e-2


def test_tiled_backward_matches_dense():
    n = 400
    s, proj = _setup(n, 3)
    rng = np.random.default_rng(0)
    v_img = jnp.asarray(rng.normal(size=(s["H"], s["W"], 3)).astype(np.float32))
    v_ft = jnp.asarray(rng.normal(size=(s["H"], s["W"])).astype(np.float32))

    def tiled_f(xys, con, col, op, bg):
        return rasterize_tiled(
            xys, con, col, op, proj.depths, proj.radii,
            proj.num_tiles_hit, proj.tile_min, proj.tile_max, bg, s["H"], s["W"],
        )

    def dense_f(xys, con, col, op, bg):
        return rasterize(
            xys, con, col, op, proj.depths, proj.mask, bg, s["H"], s["W"],
        )

    args = (proj.xys, proj.conics, jnp.asarray(s["colors"]),
            jnp.asarray(s["opacities"]), jnp.asarray(s["background"]))
    cot = (v_img, v_ft)
    out_t, vjp_t = jax.vjp(tiled_f, *args)
    g_t = vjp_t(cot)
    out_d, vjp_d = jax.vjp(dense_f, *args)
    g_d = vjp_d(cot)

    names = ["xys", "conics", "colors", "opac", "bg"]
    for name, gt_, gd_ in zip(names, g_t, g_d):
        a, b = np.asarray(gt_), np.asarray(gd_).reshape(np.shape(gt_))
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        assert abs(na - nb) <= 2e-2 * max(nb, 1e-9), f"{name}: norms {na} vs {nb}"
        scale = np.abs(b).max() + 1e-12
        rel = np.abs(a - b) / np.maximum(np.abs(b), 1e-2 * scale)
        assert (rel <= 1e-2).mean() >= 0.97, f"{name}: {(rel > 1e-2).mean():.4f} off"


def test_tiled_gradcheck_small():
    """Finite-difference check of the tiled custom VJP on a tiny scene
    (smooth region: no Gaussian near threshold boundaries)."""
    H = W = 32
    xys = jnp.asarray([[10.0, 12.0], [20.0, 18.0], [16.0, 16.0]])
    conics = jnp.asarray([[0.08, 0.01, 0.09], [0.05, -0.01, 0.06], [0.04, 0.0, 0.04]])
    colors = jnp.asarray([[0.9, 0.2, 0.1], [0.1, 0.8, 0.3], [0.2, 0.3, 0.9]])
    opac = jnp.asarray([0.7, 0.6, 0.5])
    depths = jnp.asarray([1.0, 2.0, 3.0])
    radii = jnp.asarray([12, 12, 14], jnp.int32)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    tile_min = jnp.zeros((3, 2), jnp.int32)
    tile_max = jnp.full((3, 2), 2, jnp.int32)
    nth = jnp.full((3,), 4, jnp.int32)

    def f(xys_, con_, col_, op_):
        img, _ = rasterize_tiled(
            xys_, con_, col_, op_, depths, radii, nth, tile_min, tile_max, bg, H, W
        )
        return jnp.sum(img * jnp.cos(jnp.arange(H * W * 3).reshape(H, W, 3) * 0.01))

    grads = jax.grad(f, argnums=(0, 1, 2, 3))(xys, conics, colors, opac)
    args = [xys, conics, colors, opac]

    def fd_at(ai, idx, eps):
        pert = np.asarray(args[ai], np.float64).copy()
        pert[idx] += eps
        f_plus = float(f(*[jnp.asarray(pert if i == ai else args[i]) for i in range(4)]))
        pert[idx] -= 2 * eps
        f_minus = float(f(*[jnp.asarray(pert if i == ai else args[i]) for i in range(4)]))
        return (f_plus - f_minus) / (2 * eps)

    checked = 0
    for ai, g in enumerate(grads):
        for idx in np.ndindex(*np.shape(args[ai])):
            fd1 = fd_at(ai, idx, 1e-3)
            fd2 = fd_at(ai, idx, 5e-4)
            # the compositing has hard alpha/T thresholds; FD is only valid
            # away from a crossing — skip points where FD itself is unstable
            if abs(fd1 - fd2) > 2e-2 * max(1.0, abs(fd1)):
                continue
            got = float(np.asarray(g)[idx])
            assert abs(fd1 - got) <= 3e-2 * max(1.0, abs(fd1)), (ai, idx, fd1, got)
            checked += 1
    assert checked >= 15, f"too few smooth FD points ({checked})"
