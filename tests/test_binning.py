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
