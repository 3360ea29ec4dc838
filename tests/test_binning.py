"""Tile binning vs a brute-force NumPy reference."""
import numpy as np
import jax.numpy as jnp

from opensplat_tpu.ops import project_gaussians
from opensplat_tpu.ops.binning import bin_gaussians, num_tiles
from scene_utils import make_scene


def _project_gpu(s, n):
    return project_gaussians(
        jnp.asarray(s["means"]), jnp.asarray(s["scales"]), 1.0,
        jnp.asarray(s["quats"]), jnp.asarray(s["viewmat"]), jnp.asarray(s["projmat"]),
        s["fx"], s["fy"], s["cx"], s["cy"], s["H"], s["W"], mode="gpu",
    )


def test_binning_matches_bruteforce():
    s = make_scene(n=250, seed=4)
    proj = _project_gpu(s, 250)
    H, W = s["H"], s["W"]
    tb_x, tb_y = num_tiles(H, W)
    binned = bin_gaussians(proj, H, W, max_isects=4096)

    nth = np.asarray(proj.num_tiles_hit)
    tmin = np.asarray(proj.tile_min)
    tmax = np.asarray(proj.tile_max)
    depths = np.asarray(proj.depths)

    assert int(binned.n_isects) == nth.sum()

    # brute-force per-tile lists sorted by depth
    want = {t: [] for t in range(tb_x * tb_y)}
    for g in range(250):
        if nth[g] == 0:
            continue
        for ty in range(tmin[g, 1], tmax[g, 1]):
            for tx in range(tmin[g, 0], tmax[g, 0]):
                want[ty * tb_x + tx].append(g)
    for t in want:
        want[t].sort(key=lambda g: (depths[g], g))

    gids = np.asarray(binned.gauss_ids)
    start = np.asarray(binned.tile_start)
    end = np.asarray(binned.tile_end)
    for t in range(tb_x * tb_y):
        got = list(gids[start[t]:end[t]])
        assert got == want[t], f"tile {t}: {got} != {want[t]}"


def test_binning_overflow_reports_true_count():
    s = make_scene(n=250, seed=4)
    proj = _project_gpu(s, 250)
    total = int(np.asarray(proj.num_tiles_hit).sum())
    binned = bin_gaussians(proj, s["H"], s["W"], max_isects=64)
    assert int(binned.n_isects) == total  # true count even though truncated
    assert int(np.asarray(binned.valid).sum()) == min(64, total)


def test_cull_drops_only_unreachable_pairs():
    """The exact tile-ellipse cull must keep every (gaussian, tile) pair
    whose max alpha over the tile's pixel centers reaches 1/255, and its
    per-Gaussian isect_counts must match the emitted stream."""
    from opensplat_tpu.ops.rasterize import ALPHA_THRESH

    s = make_scene(n=250, seed=11)
    proj = _project_gpu(s, 250)
    H, W = s["H"], s["W"]
    tb_x, tb_y = num_tiles(H, W)
    rng = np.random.default_rng(3)
    opac = rng.uniform(0.01, 1.0, (250,)).astype(np.float32)
    binned = bin_gaussians(
        proj, H, W, max_isects=4096, opacities=jnp.asarray(opac),
        alpha_thresh=ALPHA_THRESH,
    )

    nth = np.asarray(proj.num_tiles_hit)
    tmin = np.asarray(proj.tile_min)
    tmax = np.asarray(proj.tile_max)
    xys = np.asarray(proj.xys)
    con = np.asarray(proj.conics)

    # brute-force: max alpha over the tile's 16x16 pixel centers
    def max_alpha(g, tx, ty):
        px, py = np.meshgrid(tx * 16 + np.arange(16), ty * 16 + np.arange(16))
        dx = xys[g, 0] - px
        dy = xys[g, 1] - py
        A, B, C = con[g]
        sigma = 0.5 * (A * dx * dx + C * dy * dy) + B * dx * dy
        return float(opac[g] * np.exp(-np.maximum(sigma, 0.0)).max())

    gids = np.asarray(binned.gauss_ids)
    start = np.asarray(binned.tile_start)
    end = np.asarray(binned.tile_end)
    kept = {
        (t, g) for t in range(tb_x * tb_y) for g in gids[start[t]:end[t]]
    }
    n_required = 0
    for g in range(250):
        if nth[g] == 0:
            continue
        for ty in range(tmin[g, 1], tmax[g, 1]):
            for tx in range(tmin[g, 0], tmax[g, 0]):
                if max_alpha(g, tx, ty) >= ALPHA_THRESH:
                    n_required += 1
                    assert (ty * tb_x + tx, g) in kept, (
                        f"culled a contributing pair g={g} tile=({tx},{ty})"
                    )
    # the cull must actually drop something on this scene
    assert len(kept) < nth.sum()
    assert len(kept) >= n_required
    # per-gaussian emitted counts match the stream
    counts = np.asarray(binned.isect_counts)
    stream_counts = np.zeros(250, np.int64)
    for t in range(tb_x * tb_y):
        for g in gids[start[t]:end[t]]:
            stream_counts[g] += 1
    np.testing.assert_array_equal(counts[:250], stream_counts)


def test_cull_with_split_layout_budget():
    """layout_size < max_isects still lays out every kept entry when the
    kept total fits, and tile ranges stay 128-aligned-start."""
    from opensplat_tpu.ops.rasterize import ALPHA_THRESH

    s = make_scene(n=250, seed=11)
    proj = _project_gpu(s, 250)
    H, W = s["H"], s["W"]
    rng = np.random.default_rng(3)
    opac = rng.uniform(0.01, 1.0, (250,)).astype(np.float32)
    full = bin_gaussians(
        proj, H, W, max_isects=8192, align=128, opacities=jnp.asarray(opac),
        alpha_thresh=ALPHA_THRESH,
    )
    kept_padded = int(full.n_isects)
    small = bin_gaussians(
        proj, H, W, max_isects=8192, align=128, opacities=jnp.asarray(opac),
        layout_size=kept_padded, alpha_thresh=ALPHA_THRESH,
    )
    assert int(small.n_isects) == kept_padded
    np.testing.assert_array_equal(
        np.asarray(small.gauss_ids), np.asarray(full.gauss_ids)[:kept_padded]
    )
    np.testing.assert_array_equal(
        np.asarray(small.tile_start), np.asarray(full.tile_start)
    )
    np.testing.assert_array_equal(
        np.asarray(small.tile_end), np.asarray(full.tile_end)
    )


def test_count_isects_fast_path_matches_histogram():
    """align=1 short-circuits to sum(num_tiles_hit); pin it against the
    4-corner-scatter histogram (align>1 path) computed at align=1
    semantics, and check the align>1 padded total is a proper bound."""
    from opensplat_tpu.ops.binning import count_isects

    s = make_scene(n=250, seed=11)
    proj = _project_gpu(s, 250)
    H, W = s["H"], s["W"]
    tb_x, tb_y = num_tiles(H, W)

    total, padded1 = count_isects(proj, H, W, align=1)
    nth = np.asarray(proj.num_tiles_hit)
    assert int(total) == nth.sum()
    assert int(padded1) == nth.sum()

    # histogram path (align=128): per-tile counts padded up
    tmin, tmax = np.asarray(proj.tile_min), np.asarray(proj.tile_max)
    hist = np.zeros((tb_y, tb_x), np.int64)
    for g in range(250):
        if nth[g] == 0:
            continue
        hist[tmin[g, 1]:tmax[g, 1], tmin[g, 0]:tmax[g, 0]] += 1
    want_padded = ((hist + 127) // 128 * 128).sum()
    total128, padded128 = count_isects(proj, H, W, align=128)
    assert int(total128) == nth.sum()
    assert int(padded128) == want_padded
