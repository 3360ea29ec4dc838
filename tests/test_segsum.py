"""Conformance of the Pallas streaming segment-sum kernel (segsum.py)
against a NumPy reference — the reduction that replaces the XLA
cumsum+boundary-gather scheme in the rasterizer backward
(backward.cu:331-352 semantics: deterministic per-Gaussian sums)."""
import numpy as np

import jax.numpy as jnp

from opensplat_tpu.ops.pallas.raster import pack_bf16_pair, unpack_bf16_pair
from opensplat_tpu.ops.pallas.segsum import pallas_segment_sum


def _run_case(c, i, seed, max_cnt=12):
    rng = np.random.default_rng(seed)
    cnt = rng.integers(0, max_cnt, (c,))
    total = int(cnt.sum())
    assert total <= i, (total, i)
    gid = np.repeat(np.arange(c), cnt)
    gid = np.concatenate([gid, np.full((i - total,), c)]).astype(np.int32)
    vals = rng.normal(0, 1, (9, i)).astype(np.float32)
    planes = (
        pack_bf16_pair(jnp.asarray(vals[0]), jnp.asarray(vals[1])),
        pack_bf16_pair(jnp.asarray(vals[2]), jnp.asarray(vals[3])),
        pack_bf16_pair(jnp.asarray(vals[4]), jnp.asarray(vals[5])),
        pack_bf16_pair(jnp.asarray(vals[6]), jnp.asarray(vals[7])),
        jnp.asarray(vals[8]),
    )
    ends = jnp.asarray(np.minimum(np.cumsum(cnt), i), jnp.int32)
    acc = np.asarray(
        pallas_segment_sum(jnp.asarray(gid), planes, ends, interpret=True)
    )

    # NumPy reference with identical bf16-pair rounding
    cols = []
    for k in range(4):
        hi, lo = unpack_bf16_pair(planes[k])
        cols += [np.asarray(hi), np.asarray(lo)]
    cols.append(vals[8])
    cols = np.stack(cols, axis=1)  # (I, 9)
    ref = np.zeros((c, 9), np.float32)
    np.add.at(ref, gid[:total], cols[:total])
    np.testing.assert_allclose(acc, ref, rtol=1e-5, atol=1e-5)
    return total


def test_segsum_basic():
    """C not a multiple of the 512 block (sentinel id lands INSIDE the
    last block's one-hot range and must be sliced away), I > chunk."""
    assert _run_case(c=700, i=4096, seed=0) > 0


def test_segsum_small_stream():
    """Stream shorter than the DMA chunk (R = min(R, I) path) and a
    capacity that is an exact block multiple."""
    _run_case(c=512, i=256, seed=1, max_cnt=1)      # all-empty segments
    _run_case(c=384, i=256, seed=2, max_cnt=2)


def test_segsum_hot_gaussian():
    """One gaussian with a segment spanning many chunks (inner loop
    iterates), plus empty gaussians around it."""
    c, i = 600, 8192
    rng = np.random.default_rng(3)
    cnt = np.zeros((c,), np.int64)
    cnt[117] = 6000   # spans ~6 chunks
    cnt[118] = 1
    cnt[599] = 500
    total = int(cnt.sum())
    gid = np.repeat(np.arange(c), cnt)
    gid = np.concatenate([gid, np.full((i - total,), c)]).astype(np.int32)
    vals = rng.normal(0, 1, (9, i)).astype(np.float32)
    planes = (
        pack_bf16_pair(jnp.asarray(vals[0]), jnp.asarray(vals[1])),
        pack_bf16_pair(jnp.asarray(vals[2]), jnp.asarray(vals[3])),
        pack_bf16_pair(jnp.asarray(vals[4]), jnp.asarray(vals[5])),
        pack_bf16_pair(jnp.asarray(vals[6]), jnp.asarray(vals[7])),
        jnp.asarray(vals[8]),
    )
    ends = jnp.asarray(np.minimum(np.cumsum(cnt), i), jnp.int32)
    acc = np.asarray(
        pallas_segment_sum(jnp.asarray(gid), planes, ends, interpret=True)
    )
    cols = []
    for k in range(4):
        hi, lo = unpack_bf16_pair(planes[k])
        cols += [np.asarray(hi), np.asarray(lo)]
    cols.append(vals[8])
    cols = np.stack(cols, axis=1)
    ref = np.zeros((c, 9), np.float32)
    np.add.at(ref, gid[:total], cols[:total])
    # a 6000-row f32 sum accumulates rounding; compare against a float64
    # reference with proportional tolerance
    ref64 = np.zeros((c, 9), np.float64)
    np.add.at(ref64, gid[:total], cols[:total].astype(np.float64))
    np.testing.assert_allclose(acc, ref64, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(acc, ref, rtol=1e-3, atol=1e-3)


def test_segsum_denormal_bit_patterns():
    """Packed pairs whose f32 interpretation is DENORMAL (zero hi half,
    nonzero lo half — e.g. v_x == 0 with v_y != 0) must survive: the
    kernel's int32-lane transport exists precisely because TPU XLA
    flushes denormal f32 patterns to zero in data movement (measured:
    a concatenate zeroed every gid bit pattern < 2^23)."""
    c, i = 512, 1024
    cnt = np.ones((c,), np.int64)
    cnt[c // 2:] = 0
    total = int(cnt.sum())
    gid = np.repeat(np.arange(c), cnt)
    gid = np.concatenate([gid, np.full((i - total,), c)]).astype(np.int32)
    zero = jnp.zeros((i,), jnp.float32)
    vy = jnp.full((i,), 1.25e-3, jnp.float32)
    planes = (
        pack_bf16_pair(zero, vy),        # denormal f32 patterns
        pack_bf16_pair(vy, zero),
        pack_bf16_pair(zero, zero),
        pack_bf16_pair(zero, vy),
        zero,
    )
    ends = jnp.asarray(np.minimum(np.cumsum(cnt), i), jnp.int32)
    acc = np.asarray(
        pallas_segment_sum(jnp.asarray(gid), planes, ends, interpret=True)
    )
    vy_r = float(np.asarray(unpack_bf16_pair(planes[0])[1])[0])
    assert vy_r != 0.0
    np.testing.assert_allclose(acc[: c // 2, 1], vy_r, rtol=1e-6)  # vy
    np.testing.assert_allclose(acc[: c // 2, 2], vy_r, rtol=1e-6)  # vA
    np.testing.assert_allclose(acc[: c // 2, 7], vy_r, rtol=1e-6)  # vg
    np.testing.assert_array_equal(acc[c // 2:, :], 0.0)
