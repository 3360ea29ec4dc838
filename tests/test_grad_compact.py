"""Compact gradient-stream tests: the backward writes per-tile processed
prefixes (ops/pallas/raster.py compact_grad_layout); parity of the sorted
compact reduction vs the scatter reduction, budget-overflow redirect
behavior, and demand reporting."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opensplat_tpu.ops.pallas import integration as integ
from opensplat_tpu.ops.pallas.integration import rasterize_pallas


def _scene(n=300, h=96, w=96, seed=0, opacity=0.9):
    rng = np.random.default_rng(seed)
    xys = rng.uniform(4, min(h, w) - 4, (n, 2)).astype(np.float32)
    s = rng.uniform(1.5, 6.0, (n,)).astype(np.float32)
    conics = np.stack(
        [1.0 / s**2, np.zeros(n, np.float32), 1.0 / s**2], axis=1
    ).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opac = np.full((n,), opacity, np.float32)
    depths = rng.uniform(1, 10, (n,)).astype(np.float32)
    radii = (3 * s).astype(np.int32) + 1
    tile_min = np.clip((xys - 3 * s[:, None]) // 16, 0, None).astype(np.int32)
    tile_max = np.minimum(
        (xys + 3 * s[:, None]) // 16 + 1,
        [(w + 15) // 16, (h + 15) // 16],
    ).astype(np.int32)
    num_tiles_hit = (
        (tile_max[:, 0] - tile_min[:, 0]) * (tile_max[:, 1] - tile_min[:, 1])
    ).astype(np.int32)
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    return tuple(
        jnp.asarray(v)
        for v in (xys, conics, colors, opac, depths, radii, num_tiles_hit,
                  tile_min, tile_max, bg)
    ) + (h, w)


def _loss_grads(args, h, w, **kw):
    def loss(xys, conics, colors, opac):
        img, _ = rasterize_pallas(
            xys, conics, colors, opac, *args[4:], h, w, **kw
        )
        return jnp.sum(img * jnp.cos(jnp.arange(img.size).reshape(img.shape)))

    return jax.grad(loss, argnums=(0, 1, 2, 3))(*args[:4])


def test_compact_sort_matches_scatter():
    """The sorted compact-stream reduction == the scatter reduction over
    the same compact records (exact: same addends, f32 sums)."""
    *args, h, w = _scene()
    g_sort = _loss_grads(args, h, w)
    old = integ.SEGSUM_SORT_THRESHOLD
    integ.SEGSUM_SORT_THRESHOLD = 1 << 30  # force the scatter path
    try:
        g_scat = _loss_grads(args, h, w)
    finally:
        integ.SEGSUM_SORT_THRESHOLD = old
    for a, b in zip(g_sort, g_scat):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_compact_xla_fallback_matches():
    """SEGSUM_PALLAS=0 (cumsum-difference over a C-query searchsorted)
    reproduces the pallas one-hot segment sum on the compact stream."""
    *args, h, w = _scene(seed=3)
    g_pl = _loss_grads(args, h, w)
    old = integ.SEGSUM_PALLAS
    integ.SEGSUM_PALLAS = False
    try:
        g_xla = _loss_grads(args, h, w)
    finally:
        integ.SEGSUM_PALLAS = old
    for a, b in zip(g_pl, g_xla):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_grad_budget_demand_reported():
    """n_grads (the compact total) is reported through return_isects and
    bounded by the safe default budget."""
    *args, h, w = _scene(seed=1)
    img, ft, n_isects, n_grads = rasterize_pallas(
        *args, h, w, return_isects=True
    )
    tb = ((w + 15) // 16) * ((h + 15) // 16)
    from opensplat_tpu.ops.pallas.raster import K

    assert int(n_grads) % K == 0
    assert 0 < int(n_grads) <= int(n_isects) + 2 * K * tb


def test_grad_budget_overflow_redirect():
    """A too-small grad budget must not corrupt memory or NaN: tail
    tiles' gradients are zeroed (redirected to the trash chunk), the
    image itself is untouched, and the true demand is still reported."""
    *args, h, w = _scene(seed=2)
    img_ref, _, _, n_grads = rasterize_pallas(*args, h, w, return_isects=True)
    assert int(n_grads) > 256, "scene too small to exercise overflow"

    small = 256  # deliberately insufficient
    img_small, _ = rasterize_pallas(*args, h, w, grad_isects=small)
    np.testing.assert_allclose(
        np.asarray(img_ref), np.asarray(img_small), rtol=0, atol=0
    )

    g_small = _loss_grads(args, h, w, grad_isects=small)
    g_full = _loss_grads(args, h, w)
    for a in g_small:
        assert np.all(np.isfinite(np.asarray(a)))
    # the first tile's gaussians still get gradients; SOME gradient mass
    # must be missing vs the full-budget run (tail tiles redirected)
    tot_small = sum(float(jnp.sum(jnp.abs(g))) for g in g_small)
    tot_full = sum(float(jnp.sum(jnp.abs(g))) for g in g_full)
    assert tot_small < tot_full


def test_compact_budget_exact_fit():
    """grad_isects == the reported n_grads reproduces the default-budget
    gradients (same addends; the segment-sum chunk windows shift with the
    buffer length, so sums may reassociate at f32 rounding level)."""
    *args, h, w = _scene(seed=4, opacity=0.95)
    _, _, _, n_grads = rasterize_pallas(*args, h, w, return_isects=True)
    g_fit = _loss_grads(args, h, w, grad_isects=int(n_grads))
    g_def = _loss_grads(args, h, w)
    for a, b in zip(g_fit, g_def):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8
        )
