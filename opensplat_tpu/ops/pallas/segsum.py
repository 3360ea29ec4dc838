"""Pallas streaming segment-sum: per-Gaussian reduction of the gid-sorted
gradient-record stream in ONE pass over HBM.

Replaces the XLA reduction in the rasterizer backward (an (I, 8) + (I,)
multi-pass cumsum plus C-row boundary gathers — the analogue of the
reference's atomicAdd accumulation, backward.cu:331-352) with a kernel
built for the hardware:

  * grid over GAUSSIAN blocks of G ids; block i's rows live in the
    contiguous window [ends[i*G - 1], ends[i*G + G - 1]) of the sorted
    stream (ends = clamped cumsum of per-Gaussian counts from binning),
    so each block streams only its own rows — total traffic is one read
    of the stream;
  * rows reduce onto their Gaussian with a ONE-HOT MATMUL on the MXU:
    vals (9, R) x onehot (R, G) -> (9, G) block accumulator, where
    onehot[r, g] = (gid[r] == block_base + g). No scatter (64 ms/column
    at 8.5M rows on v5e), no multi-pass cumsum, and no cumsum-difference
    cancellation — each segment is summed directly in f32;
  * chunks of R rows are staged HBM -> VMEM with double-buffered async
    DMA like the rasterize kernels; rows outside the block's id range
    fail the one-hot test, so no boundary masking is needed beyond the
    final-chunk clamp guard;
  * the stream rides ONE (8, R) DMA per chunk: 5 packed gradient planes,
    the gid plane, two pad rows (Mosaic DMA slices must cover 8
    sublanes). The stack is INT32, not f32: packed bf16-pair / raw-id
    bit patterns are often f32-DENORMAL, and TPU XLA flushes denormals
    to zero in f32 data movement like concatenate (measured: a 1-row
    f32 concat zeroed every gid < 2^23). Integer lanes are never
    flushed; the kernel bitcasts to f32 only inside VMEM.

The 5 input planes are the backward kernel's packed gradient records
(raster.py module docstring); the kernel unpacks the bf16 pairs in VMEM
and emits 9 f32 rows per Gaussian: vx, vy, vA, vB, vC, vop, vr, vg, vb.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# gaussians per output block (lane dim) / stream rows per DMA chunk;
# env-tunable for on-chip A/B sweeps (see expand.py)
import os as _os

G_BLOCK = int(_os.environ.get("OPENSPLAT_TPU_SEGSUM_GBLOCK", 512))
R_CHUNK = int(_os.environ.get("OPENSPLAT_TPU_SEGSUM_RCHUNK", 1024))


def _unpack_bits(bits):
    """int32 (bf16_hi | bf16_lo) plane -> two f32 rows (raster.py pairs)."""
    hi = jax.lax.bitcast_convert_type(bits & jnp.int32(-65536), jnp.float32)
    lo = jax.lax.bitcast_convert_type(bits << 16, jnp.float32)
    return hi, lo


def _segsum_kernel(win_ref, planes_hbm, out_ref,
                   pbuf, psem, *, g_blk, r_chunk, n_rows):
    # win_ref: (2, n_blocks) int32 per-BLOCK window bounds — scalar
    # prefetch lives in SMEM (1 MB), so a (C,)-sized array would not fit
    # at 1M+ capacity; only the per-block reductions ride along
    i = pl.program_id(0)
    g0 = i * g_blk
    w_start = win_ref[0, i]
    w_end = win_ref[1, i]
    base0 = pl.multiple_of(w_start - jax.lax.rem(w_start, r_chunk), r_chunk)
    n_sub = jnp.where(w_end > base0, pl.cdiv(w_end - base0, r_chunk), 0)

    out_ref[:, :] = jnp.zeros((10, g_blk), jnp.float32)

    def _pdma(j, slot):
        base = pl.multiple_of(
            jnp.clip(base0 + j * r_chunk, 0, n_rows - r_chunk), r_chunk
        )
        return pltpu.make_async_copy(
            planes_hbm.at[:, pl.ds(base, r_chunk)], pbuf.at[slot], psem.at[slot]
        )

    @pl.when(n_sub > 0)
    def _():
        _pdma(jnp.int32(0), jnp.int32(0)).start()

    def body(j, carry):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_sub)
        def _():
            _pdma(j + 1, 1 - slot).start()

        _pdma(j, slot).wait()

        base_unc = base0 + j * r_chunk
        base = jnp.clip(base_unc, 0, n_rows - r_chunk)
        # the final chunk may clamp backwards over rows an earlier chunk
        # of THIS block already counted — mask them out
        row = base + jax.lax.broadcasted_iota(jnp.int32, (1, r_chunk), 1)
        fresh = row >= base_unc

        p = pbuf[slot]  # (8, R) int32: 5 packed planes, gid, 0, 0
        lg = p[5:6, :] - g0  # (1, R) local gaussian ids
        oh = (
            (jax.lax.broadcasted_iota(jnp.int32, (g_blk, r_chunk), 0) == lg)
            & fresh
        ).astype(jnp.float32)  # (G, R)

        vx, vy = _unpack_bits(p[0:1, :])
        vA, vB = _unpack_bits(p[1:2, :])
        vC, vop = _unpack_bits(p[2:3, :])
        vr, vg = _unpack_bits(p[3:4, :])
        # rows 0-7 are exactly bf16-representable, so the MXU's bf16
        # pass sums them EXACTLY; the raw-f32 vb row is split into a
        # bf16-exact hi + exact residual lo (vb = hi + lo, recombined
        # outside) so its sum keeps ~f32 accuracy too
        vb_hi, _ = _unpack_bits(p[4:5, :])
        vb = jax.lax.bitcast_convert_type(p[4:5, :], jnp.float32)
        vb_lo = vb - vb_hi
        vals10 = jnp.concatenate(
            [vx, vy, vA, vB, vC, vop, vr, vg, vb_hi, vb_lo], axis=0
        )  # (10, R)

        out_ref[:, :] += jax.lax.dot_general(
            vals10, oh,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return carry

    jax.lax.fori_loop(0, n_sub, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("n_gaussians", "interpret"))
def pallas_segment_sum(gid_sorted, planes_sorted, ends=None,
                       n_gaussians: int = 0, interpret=False):
    """Per-Gaussian sums of the gid-sorted gradient stream.

    gid_sorted: (I,) int32 ascending (invalid tail = sentinel >= C;
    leading rows with NEGATIVE ids — the compacted stream's zero-filled
    tail after sorting — are excluded by block 0's window)
    planes_sorted: tuple of 5 (I,) f32 packed gradient planes, same order
    (a tuple, NOT a stacked array: stacking f32 planes at the XLA level
    would flush denormal bit patterns — see module docstring)
    ends: (C,) int32 cumsum of per-Gaussian counts clamped to I, or None
    when per-Gaussian counts are unknown (the compacted backward stream):
    then pass n_gaussians=C and the per-BLOCK windows come from one small
    searchsorted over gid_sorted (n_blocks queries — the cheap T-query
    pattern, not a per-row search).
    Returns (C, 9) f32: vx, vy, vA, vB, vC, vop, vr, vg, vb per Gaussian.
    """
    assert ends is not None or n_gaussians > 0, "need ends or n_gaussians"
    n_rows = gid_sorted.shape[0]
    c = n_gaussians if ends is None else ends.shape[0]
    r_chunk = min(R_CHUNK, n_rows)
    g_blk = G_BLOCK
    c_pad = ((c + g_blk - 1) // g_blk) * g_blk
    # per-block [w_start, w_end) windows: the only scalars the kernel
    # needs (SMEM-sized; a (C,) prefetch overflows SMEM at 1M capacity)
    if ends is None:
        bounds = jnp.arange(1, c_pad // g_blk + 1, dtype=jnp.int32) * g_blk
        wends = jnp.searchsorted(
            gid_sorted, bounds, side="left"
        ).astype(jnp.int32)
        wstart0 = jnp.searchsorted(
            gid_sorted, jnp.zeros((1,), jnp.int32), side="left"
        ).astype(jnp.int32)
        win = jnp.stack(
            [jnp.concatenate([wstart0, wends[:-1]]), wends]
        )
    else:
        ends_pad = jnp.concatenate(
            [ends.astype(jnp.int32),
             jnp.broadcast_to(ends[-1].astype(jnp.int32), (c_pad - c,))]
        )
        wends = ends_pad.reshape(c_pad // g_blk, g_blk)[:, g_blk - 1]
        win = jnp.stack(
            [jnp.concatenate([jnp.zeros((1,), jnp.int32), wends[:-1]]), wends]
        )
    # int32 stack: f32 concat/copies FLUSH DENORMAL BIT PATTERNS on TPU
    # (see module docstring) — bitcast each plane to int32 FIRST
    planes8 = jnp.stack(
        [jax.lax.bitcast_convert_type(pl_, jnp.int32) for pl_ in planes_sorted]
        + [gid_sorted.astype(jnp.int32)]
        + [jnp.zeros((n_rows,), jnp.int32)] * 2,
        axis=0,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c_pad // g_blk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((10, g_blk), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 8, r_chunk), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    acc10 = pl.pallas_call(
        functools.partial(
            _segsum_kernel, g_blk=g_blk, r_chunk=r_chunk, n_rows=n_rows
        ),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((10, c_pad), jnp.float32)],
        interpret=interpret,
    )(win, planes8)[0]
    acc9 = jnp.concatenate(
        [acc10[:8], acc10[8:9] + acc10[9:10]], axis=0
    )
    return acc9[:, :c].T
