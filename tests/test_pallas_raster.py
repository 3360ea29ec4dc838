"""Pallas kernel conformance vs the XLA tiled renderer.

On CPU these run through the Pallas interpreter (bit-faithful to the
kernel semantics); on TPU hardware the same comparisons were validated at
kernel bring-up (knife-edge threshold flips only)."""
import numpy as np
import jax
import jax.numpy as jnp

from opensplat_tpu.ops import project_gaussians
from opensplat_tpu.ops.rasterize_tiled import rasterize_tiled
from opensplat_tpu.ops.pallas.integration import rasterize_pallas
from scene_utils import make_scene


def _setup(n=200, seed=2):
    s = make_scene(n=n, seed=seed)
    proj = project_gaussians(
        jnp.asarray(s["means"]), jnp.asarray(s["scales"]), 1.0,
        jnp.asarray(s["quats"]), jnp.asarray(s["viewmat"]), jnp.asarray(s["projmat"]),
        s["fx"], s["fy"], s["cx"], s["cy"], s["H"], s["W"], mode="gpu",
    )
    common = (proj.depths, proj.radii, proj.num_tiles_hit, proj.tile_min,
              proj.tile_max, jnp.asarray(s["background"]), s["H"], s["W"])
    args = (proj.xys, proj.conics, jnp.asarray(s["colors"]),
            jnp.asarray(s["opacities"]))
    return s, args, common


def test_pallas_forward_matches_tiled():
    s, args, common = _setup()
    img_t, ft_t = rasterize_tiled(*args, *common)
    img_p, ft_p = rasterize_pallas(*args, *common)
    # colors ride the records as 10-bit fixed point (step 1/256): the
    # image may deviate by up to one quantization step; transmittance
    # only depends on opacity/conics which stay exact f32
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_t), atol=4e-3)
    np.testing.assert_allclose(np.asarray(ft_p), np.asarray(ft_t), atol=1e-5)


def test_pallas_backward_matches_tiled():
    s, args, common = _setup(n=150, seed=5)
    rng = np.random.default_rng(0)
    vi = jnp.asarray(rng.normal(size=(s["H"], s["W"], 3)).astype(np.float32))
    vt = jnp.asarray(rng.normal(size=(s["H"], s["W"])).astype(np.float32))

    def grads(f):
        _, vjp = jax.vjp(lambda a, b, c, d: f(a, b, c, d, *common), *args)
        return vjp((vi, vt))

    g_t = grads(rasterize_tiled)
    g_p = grads(rasterize_pallas)
    names = ["xys", "conics", "colors", "opac"]
    for name, a, b in zip(names, g_p, g_t):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-12
        # v_alpha mixes in the (quantized) colors, so position/shape
        # gradients inherit the 1/256 color quantization scale
        np.testing.assert_allclose(a, b, atol=4e-3 * scale, rtol=4e-3,
                                   err_msg=name)


def test_pallas_empty_scene():
    s, args, common = _setup(n=16, seed=0)
    radii0 = jnp.zeros_like(common[1])
    nth0 = jnp.zeros_like(common[2])
    img, ft = rasterize_pallas(args[0], args[1], args[2], args[3],
                               common[0], radii0, nth0, common[3], common[4],
                               common[5], common[6], common[7])
    np.testing.assert_allclose(
        np.asarray(img), np.broadcast_to(np.asarray(common[5]), (s["H"], s["W"], 3)),
        atol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(ft), 1.0, atol=1e-7)


def test_backward_reduction_paths_agree(monkeypatch):
    """The sort+cumsum large-stream reduction must produce the same
    gradients as the small-stream scatter-add path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import opensplat_tpu.ops.pallas.integration as integ
    from opensplat_tpu.ops.projection import project_gaussians
    from tests.scene_utils import make_scene

    sc = make_scene(n=200, seed=9)
    pg = project_gaussians(
        jnp.asarray(sc["means"]), jnp.asarray(sc["scales"]), 1.0,
        jnp.asarray(sc["quats"]), jnp.asarray(sc["viewmat"]),
        jnp.asarray(sc["projmat"]), sc["fx"], sc["fy"], sc["cx"], sc["cy"],
        sc["H"], sc["W"],
    )

    def loss(xys, conics, colors, opac):
        img, ft = integ.rasterize_pallas(
            xys, conics, colors, opac, pg.depths, pg.radii,
            pg.num_tiles_hit, pg.tile_min, pg.tile_max,
            jnp.asarray(sc["background"]), sc["H"], sc["W"],
        )
        return jnp.sum(img ** 2) + jnp.sum(ft)

    args = (pg.xys, pg.conics, jnp.asarray(sc["colors"]),
            jnp.asarray(sc["opacities"]))
    g_sorted = jax.grad(loss, argnums=(0, 1, 2, 3))(*args)  # default: sort
    monkeypatch.setattr(integ, "SEGSUM_SORT_THRESHOLD", 1 << 30)
    g_scatter = jax.grad(loss, argnums=(0, 1, 2, 3))(*args)
    for a, b in zip(g_scatter, g_sorted):
        # the two paths sum contributions in different orders; with heavy
        # cancellation the error scales with the LARGEST contribution, so
        # compare against the tensor's own gradient magnitude
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-5)


def test_pallas_with_cull_matches_tiled(monkeypatch):
    """Force the exact tile-ellipse cull on (normally gated to large
    candidate budgets) and check the full pallas path still matches the
    tiled renderer."""
    import opensplat_tpu.ops.pallas.integration as integ

    monkeypatch.setattr(integ, "CULL_MIN_CANDIDATES", 0)
    s, args, common = _setup(n=150, seed=5)
    img_t, ft_t = rasterize_tiled(*args, *common)
    img_p, ft_p = integ.rasterize_pallas(*args, *common)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_t), atol=4e-3)
    np.testing.assert_allclose(np.asarray(ft_p), np.asarray(ft_t), atol=1e-5)

    rng = np.random.default_rng(0)
    vi = jnp.asarray(rng.normal(size=(s["H"], s["W"], 3)).astype(np.float32))
    vt = jnp.asarray(rng.normal(size=(s["H"], s["W"])).astype(np.float32))

    def grads(f):
        _, vjp = jax.vjp(lambda a, b, c, d: f(a, b, c, d, *common), *args)
        return vjp((vi, vt))

    g_t = grads(rasterize_tiled)
    g_p = grads(integ.rasterize_pallas)
    for name, a, b in zip(["xys", "conics", "colors", "opac"], g_p, g_t):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a, b, atol=4e-3 * scale, rtol=4e-3,
                                   err_msg=name)
