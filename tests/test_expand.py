"""Conformance of the Pallas candidate-expansion kernel (expand.py)
against a NumPy reference and the XLA binning path — the stream
generation half of map_gaussian_to_intersects (forward.cu:107-143)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opensplat_tpu.ops.pallas.expand import INT_MAX, pallas_expand_bin

H, W = 96, 128  # 8 x 6 = 48 tiles
N_TILES = (W // 16) * (H // 16)
TBX = W // 16


def _random_boxes(c, seed, empty_frac=0.3, max_side=6):
    rng = np.random.default_rng(seed)
    bw = rng.integers(1, max_side, (c,))
    bh = rng.integers(1, max_side, (c,))
    tx0 = rng.integers(0, TBX - 1, (c,))
    ty0 = rng.integers(0, H // 16 - 1, (c,))
    bw = np.minimum(bw, TBX - tx0)
    bh = np.minimum(bh, H // 16 - ty0)
    cnt = bw * bh
    dead = rng.uniform(size=c) < empty_frac
    cnt[dead] = 0
    depths = rng.uniform(0.1, 50.0, (c,)).astype(np.float32)
    return dict(
        cnt=cnt.astype(np.int32),
        tile_min=np.stack([tx0, ty0], axis=1).astype(np.int32),
        tile_max=np.stack([tx0 + bw, ty0 + bh], axis=1).astype(np.int32),
        depth_bits=depths.view(np.int32),
    )


def _np_expand(boxes, n_rows, c):
    tile = np.full((n_rows,), N_TILES, np.int32)
    depth = np.full((n_rows,), INT_MAX, np.int32)
    gid = np.full((n_rows,), c, np.int32)
    e = 0
    for g in range(c):
        n = int(boxes["cnt"][g])
        bw = max(int(boxes["tile_max"][g, 0] - boxes["tile_min"][g, 0]), 1)
        for off in range(n):
            if e >= n_rows:
                return tile, depth, gid
            tx = boxes["tile_min"][g, 0] + off % bw
            ty = boxes["tile_min"][g, 1] + off // bw
            tile[e] = ty * TBX + tx
            depth[e] = boxes["depth_bits"][g]
            gid[e] = g
            e += 1
    return tile, depth, gid


@pytest.mark.parametrize("c,n_rows,seed", [
    (700, 4096, 0),       # c not a block multiple, window spans chunks
    (64, 512, 1),         # tiny
    (300, 640, 2),        # OVERFLOW: budget < total (tail truncation)
])
def test_expand_matches_numpy(c, n_rows, seed):
    boxes = _random_boxes(c, seed)
    tile, depth, gid, counts = pallas_expand_bin(
        jnp.asarray(boxes["cnt"]), jnp.asarray(boxes["tile_min"]),
        jnp.asarray(boxes["tile_max"]), jnp.asarray(boxes["depth_bits"]),
        H, W, n_rows, interpret=True,
    )
    rt, rd, rg = _np_expand(boxes, n_rows, c)
    np.testing.assert_array_equal(np.asarray(tile), rt)
    np.testing.assert_array_equal(np.asarray(depth), rd)
    np.testing.assert_array_equal(np.asarray(gid), rg)
    # non-cull kept counts = in-budget emitted rows per gaussian
    ref_counts = np.bincount(rg[rg < c], minlength=c)
    np.testing.assert_array_equal(np.asarray(counts), ref_counts)


def test_expand_cull_matches_xla_binning():
    """Cull-enabled kernel vs the XLA bin_gaussians pipeline on a REAL
    projected scene: same kept set, same sorted stream."""
    from scene_utils import make_scene

    from opensplat_tpu.ops.binning import bin_gaussians
    from opensplat_tpu.ops.projection import project_gaussians
    from opensplat_tpu.ops.rasterize import ALPHA_THRESH

    sc = make_scene(n=400, seed=3)
    proj = project_gaussians(
        jnp.asarray(sc["means"]), jnp.asarray(sc["scales"]), 1.0,
        jnp.asarray(sc["quats"]), jnp.asarray(sc["viewmat"]),
        jnp.asarray(sc["projmat"]), sc["fx"], sc["fy"], sc["cx"], sc["cy"],
        sc["H"], sc["W"],
        opacities=jnp.asarray(sc["opacities"]),
    )
    total = int(jnp.sum(proj.num_tiles_hit))
    assert total > 0
    n_rows = ((total + 127) // 128) * 128 + 128
    opac = jnp.asarray(sc["opacities"])

    ref = bin_gaussians(
        proj, sc["H"], sc["W"], n_rows,
        opacities=opac, alpha_thresh=ALPHA_THRESH,
    )

    s_max = jnp.log(jnp.maximum(opac.astype(jnp.float32), 1e-12) / ALPHA_THRESH)
    depth_bits = jax.lax.bitcast_convert_type(
        proj.depths.astype(jnp.float32), jnp.int32
    )
    tile, depth, gid, counts = pallas_expand_bin(
        proj.num_tiles_hit, proj.tile_min, proj.tile_max, depth_bits,
        sc["H"], sc["W"], n_rows,
        xys=proj.xys, conics=proj.conics, s_max=s_max, cull=True,
        interpret=True,
    )
    # same per-gaussian kept counts and same sorted (tile, depth, gid)
    np.testing.assert_array_equal(
        np.asarray(counts), np.asarray(ref.isect_counts)
    )
    srt = jax.lax.sort((tile, depth, gid), num_keys=2, is_stable=True)
    np.testing.assert_array_equal(
        np.asarray(srt[0]), np.asarray(ref.tile_ids)
    )
    np.testing.assert_array_equal(
        np.asarray(srt[2]), np.asarray(ref.gauss_ids)
    )


def test_expand_chunk_aligned_windows_skip_rmw():
    """Every block window starting/ending exactly on a chunk boundary:
    with 512 gaussians of count 2 each (G_BLOCK=512, R_CHUNK=1024),
    block windows are [0,1024), [1024,2048), ... — the interior-chunk
    input-DMA skip covers EVERY chunk and the output must still match
    the scalar reference (boundary RMW never fires)."""
    from opensplat_tpu.ops.pallas import expand as ex

    if ex.G_BLOCK != 512 or ex.R_CHUNK != 1024:
        pytest.skip("non-default expand block knobs")
    c = 1024  # 2 blocks, windows chunk-aligned
    rng = np.random.default_rng(5)
    tx0 = rng.integers(0, TBX - 2, (c,))
    ty0 = rng.integers(0, H // 16 - 1, (c,))
    boxes = dict(
        cnt=np.full((c,), 2, np.int32),  # 2x1 boxes -> count 2
        tile_min=np.stack([tx0, ty0], axis=1).astype(np.int32),
        tile_max=np.stack([tx0 + 2, ty0 + 1], axis=1).astype(np.int32),
        depth_bits=rng.uniform(0.1, 50.0, (c,)).astype(np.float32).view(np.int32),
    )
    n_rows = 2048
    tile, depth, gid, counts = pallas_expand_bin(
        jnp.asarray(boxes["cnt"]), jnp.asarray(boxes["tile_min"]),
        jnp.asarray(boxes["tile_max"]), jnp.asarray(boxes["depth_bits"]),
        H, W, n_rows, interpret=True,
    )
    rt, rd, rg = _np_expand(boxes, n_rows, c)
    np.testing.assert_array_equal(np.asarray(tile), rt)
    np.testing.assert_array_equal(np.asarray(depth), rd)
    np.testing.assert_array_equal(np.asarray(gid), rg)
    np.testing.assert_array_equal(np.asarray(counts), np.full((c,), 2))
