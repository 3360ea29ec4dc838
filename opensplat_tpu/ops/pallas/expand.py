"""Pallas candidate-expansion kernel: Gaussian -> (gaussian, tile) stream
generation, tile-coordinate math, and the exact tile-ellipse cull in ONE
pass — the TPU-native replacement for the XLA side of bin_gaussians'
pre-sort pipeline (itself the re-design of map_gaussian_to_intersects,
forward.cu:107-143).

The XLA path broadcasts ~7 per-Gaussian fields onto the candidate stream
with per-plane delta-scatter + multi-pass cumsum (~9 ms per plane at
6.8M candidates on v5e, PERF.md). This kernel replaces every broadcast,
the tile-coordinate div/mod, the cull test, and the per-Gaussian kept
counts with one streaming pass:

  * grid over GAUSSIAN blocks of G ids; block i's candidate rows live in
    the contiguous window [cum[i*G-1], cum[i*G+G-1]) (cum = inclusive
    cumsum of tile-bbox areas), exactly like the segment-sum kernel;
  * ROW OWNERSHIP is a range-membership one-hot built from per-Gaussian
    [start, end) columns: oh[g, r] = start[g] <= r < end[g] — each row
    matches exactly one Gaussian, empty Gaussians match nothing, rows
    past the true total match nothing;
  * every per-Gaussian field reaches its rows via a ONE-HOT MATMUL on
    the MXU: vals (32, G) x oh (G, R) -> fields (32, R). Values ride
    bf16 BYTE PLANES (0..255 is exact in bf16, products with a 0/1
    one-hot are exact, accumulation is f32) and are recombined with
    exact f32 arithmetic — ints up to 2^24 survive bit-exactly;
  * per-row math runs lane-major on the VPU: off = row - start,
    ty = off / bw (f32 division is exact-floor here: off <= 2^21,
    bw <= 2^11 keeps the quotient ulp far below 1/bw), tx = off - ty*bw,
    then the exact convex-QP tile-ellipse cull (binning.py semantics);
  * outputs write back into an input-output-ALIASED (IO_PLANES, I) int32 stream
    prefilled with sentinels: rows owned & kept get (tile_id,
    depth_bits, gid), rows owned & culled get sentinels, rows owned by
    nobody keep their prefill — boundary chunks shared between blocks
    are read-modify-written (sequential grid + per-step drains);
  * per-Gaussian kept counts fall out as one more one-hot product,
    replacing the keep-cumsum + boundary gathers.

Everything integer travels int32 end-to-end outside the MXU: TPU XLA
flushes denormal f32 bit patterns in data movement (see segsum.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..projection import BLOCK_X, BLOCK_Y

# block sizes are env-tunable for on-chip A/B sweeps: the one-hot
# membership build costs G_BLOCK * n_rows VPU ops total (smaller G =
# less compute, more grid steps + boundary-chunk RMWs)
import os as _os

# 256 measured best on v5e this round (1M@1080: 8.28 vs 8.16 steps/s at
# 512, 7.84 at 1024 — the (G, R) membership-compare build dominates the
# kernel, so smaller G wins until boundary-chunk overhead bites)
G_BLOCK = int(_os.environ.get("OPENSPLAT_TPU_EXPAND_GBLOCK", 256))
R_CHUNK = int(_os.environ.get("OPENSPLAT_TPU_EXPAND_RCHUNK", 1024))
# sublane count of the aliased io stream: 4 = 3 live planes + 1 pad —
# half the chunk DMA traffic of the conservative 8-plane layout
# (validated on the target Mosaic: +1.2% whole-step at 131k@512 on v5e;
# set 8 via env if a Mosaic version rejects sub-8-sublane DMA windows)
IO_PLANES = int(_os.environ.get("OPENSPLAT_TPU_EXPAND_IO_PLANES", 4))
INT_MAX = 2**31 - 1

# vals rows (bf16 byte planes unless noted)
_NV = 32  # padded sublane count
# 0-2: start bytes; 3-4: tmin_x; 5-6: tmin_y; 7-8: bw; 9-12: depth bytes
# 13-14: mxq+32768 bytes; 15-16: myq+32768; 17: A (bf16 value);
# 18: B; 19: C; 20: s_max; 29-30: local gid lo/hi bytes (rides the same
# one-hot matmul as every other field — no second gid matmul); rest zero
_GID_ROW = 29


def _min_sigma_over_tile(mx, my, A, B, C, tx, ty, pos_slack):
    """Conservative min of the Gaussian exponent over the tile rect —
    same formula as binning._min_sigma_over_tile (kept in sync; see
    there for the bf16-compensation derivation)."""
    dhi_x = mx - tx * float(BLOCK_X) + pos_slack
    dlo_x = dhi_x - float(BLOCK_X - 1) - 2.0 * pos_slack
    dhi_y = my - ty * float(BLOCK_Y) + pos_slack
    dlo_y = dhi_y - float(BLOCK_Y - 1) - 2.0 * pos_slack
    inside = (dlo_x <= 0.0) & (dhi_x >= 0.0) & (dlo_y <= 0.0) & (dhi_y >= 0.0)

    def q(dx, dy):
        return 0.5 * (A * dx * dx + C * dy * dy) + B * dx * dy

    def edge_x(xe):
        dy = jnp.clip(-B * xe / jnp.maximum(C, 1e-12), dlo_y, dhi_y)
        return q(xe, dy)

    def edge_y(ye):
        dx = jnp.clip(-B * ye / jnp.maximum(A, 1e-12), dlo_x, dhi_x)
        return q(dx, ye)

    m = jnp.minimum(
        jnp.minimum(edge_x(dlo_x), edge_x(dhi_x)),
        jnp.minimum(edge_y(dlo_y), edge_y(dhi_y)),
    )
    s_corner = 0.5 * (
        A * jnp.maximum(dlo_x * dlo_x, dhi_x * dhi_x)
        + C * jnp.maximum(dlo_y * dlo_y, dhi_y * dhi_y)
    )
    delta = 2.0 ** -8
    return jnp.where(inside, 0.0, m - 2.1 * delta * s_corner)


def _expand_kernel(win_ref, starts_col, cum_col, vals, zeros_io, io_ref,
                   counts_ref, buf, sem, osem,
                   *, g_blk, r_chunk, n_rows, tb_x, n_tiles, c_sentinel,
                   cull):
    del zeros_io  # aliased with io_ref; only the alias matters
    # win_ref: (2, n_blocks) int32 per-block window bounds (scalar
    # prefetch is SMEM-resident — a (C,)-sized array overflows the 1 MB
    # SMEM at 1M capacity; per-gaussian ranges ride VMEM column blocks)
    i = pl.program_id(0)
    g0 = i * g_blk
    w_start = win_ref[0, i]
    w_end = win_ref[1, i]
    base0 = pl.multiple_of(w_start - jax.lax.rem(w_start, r_chunk), r_chunk)
    n_sub = jnp.where(w_end > base0, pl.cdiv(w_end - base0, r_chunk), 0)

    counts_ref[:, :] = jnp.zeros((8, g_blk), jnp.float32)

    # r_chunk divides n_rows (asserted by the caller), so chunk windows
    # never clamp: chunks within a block never overlap, and the only
    # shared chunks are block-boundary ones (handled by ownership
    # preserve + end-of-step drains)
    def _base(j):
        return pl.multiple_of(base0 + j * r_chunk, r_chunk)

    def _in_dma(j, slot):
        return pltpu.make_async_copy(
            io_ref.at[:, pl.ds(_base(j), r_chunk)], buf.at[slot], sem.at[slot]
        )

    def _out_dma(j, slot):
        return pltpu.make_async_copy(
            buf.at[slot], io_ref.at[:, pl.ds(_base(j), r_chunk)], osem.at[slot]
        )

    def _needs_in(j):
        # interior chunks are fully owned by this block and completely
        # overwritten — only boundary chunks (shared with a neighbor
        # block or holding never-owned prefill rows) are read-modify-
        # written; skipping the read halves the io DMA traffic and
        # removes the input wait from interior iterations
        b = _base(j)
        return jnp.logical_not((b >= w_start) & (b + r_chunk <= w_end))

    @pl.when((n_sub > 0) & _needs_in(jnp.int32(0)))
    def _():
        _in_dma(jnp.int32(0), jnp.int32(0)).start()

    sc = starts_col[:, 0:1]  # (G, 1) int32
    ec = cum_col[:, 0:1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, r_chunk), 1)

    def body(j, carry):
        slot = jax.lax.rem(j, 2)

        @pl.when((j + 1 < n_sub) & _needs_in(j + 1))
        def _():
            _in_dma(j + 1, 1 - slot).start()

        @pl.when(_needs_in(j))
        def _():
            _in_dma(j, slot).wait()
        # this slot's previous write-back must have landed before reuse
        @pl.when(j >= 2)
        def _():
            _out_dma(j - 2, slot).wait()

        row = _base(j) + lane  # (1, R)
        oh_b = (row >= sc) & (row < ec)  # (G, R) membership
        oh = oh_b.astype(jnp.bfloat16)

        f = jax.lax.dot_general(
            vals[:, :], oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (32, R) exact byte-plane broadcasts

        # segments tile the window contiguously, so ownership is a
        # window test (cheaper than reducing oh over G)
        owned = (row >= w_start) & (row < w_end)  # (1, R)

        start_r = f[0:1] + 256.0 * f[1:2] + 65536.0 * f[2:3]
        off = row.astype(jnp.float32) - start_r
        bw = jnp.maximum(f[7:8] + 256.0 * f[8:9], 1.0)
        ty_off = jnp.floor(off / bw)
        tx_off = off - ty_off * bw
        tx = f[3:4] + 256.0 * f[4:5] + tx_off
        ty = f[5:6] + 256.0 * f[6:7] + ty_off

        depth_r = (
            f[9:10].astype(jnp.int32)
            | (f[10:11].astype(jnp.int32) << 8)
            | (f[11:12].astype(jnp.int32) << 16)
            | (f[12:13].astype(jnp.int32) << 24)
        )

        # local id lo/hi bytes arrive through the SAME one-hot matmul
        gid_r = g0 + (
            f[_GID_ROW:_GID_ROW + 1] + 256.0 * f[_GID_ROW + 1:_GID_ROW + 2]
        ).astype(jnp.int32)

        if cull:
            mxq = f[13:14] + 256.0 * f[14:15] - 32768.0
            myq = f[15:16] + 256.0 * f[16:17] - 32768.0
            saturated = (mxq >= 32767.0) | (mxq <= -32768.0) | \
                        (myq >= 32767.0) | (myq <= -32768.0)
            min_sigma = _min_sigma_over_tile(
                mxq * 0.25, myq * 0.25, f[17:18], f[18:19], f[19:20],
                tx, ty, pos_slack=0.13,
            )
            reachable = f[20:21] - min_sigma >= -0.05
            keep = owned & (reachable | saturated)
        else:
            keep = owned

        tile = (ty * float(tb_x) + tx).astype(jnp.int32)

        out_tile = jnp.where(keep, tile,
                             jnp.where(owned, n_tiles, buf[slot, 0:1, :]))
        out_depth = jnp.where(keep, depth_r,
                              jnp.where(owned, INT_MAX, buf[slot, 1:2, :]))
        out_gid = jnp.where(keep, gid_r,
                            jnp.where(owned, c_sentinel, buf[slot, 2:3, :]))

        buf[slot, 0:1, :] = out_tile
        buf[slot, 1:2, :] = out_depth
        buf[slot, 2:3, :] = out_gid
        _out_dma(j, slot).start()

        counts_ref[0:1, :] += jax.lax.dot_general(
            keep.astype(jnp.bfloat16), oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return carry

    j_end = jax.lax.fori_loop(0, n_sub, body, jnp.int32(0))
    del j_end

    # drain outstanding write-backs before the next grid step reads
    @pl.when(n_sub >= 1)
    def _():
        _out_dma(n_sub - 1, jax.lax.rem(n_sub - 1, 2)).wait()

    @pl.when(n_sub >= 2)
    def _():
        _out_dma(n_sub - 2, jax.lax.rem(n_sub - 2, 2)).wait()


def _bytes(v, n):
    return [((v >> (8 * k)) & 255).astype(jnp.bfloat16) for k in range(n)]


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "n_rows", "cull", "interpret"),
)
def pallas_expand_bin(
    cnt,            # (C,) int32 per-Gaussian tile-bbox areas (0 = skip)
    tile_min,       # (C, 2) int32
    tile_max,       # (C, 2) int32
    depth_bits,     # (C,) int32
    height: int,
    width: int,
    n_rows: int,    # candidate budget (128-aligned)
    xys=None,       # (C, 2) f32 — cull fields (cull=True only)
    conics=None,    # (C, 3) f32
    s_max=None,     # (C,) f32  ln(opacity / alpha_thresh)
    cull: bool = False,
    interpret: bool = False,
):
    """Returns (tile_id (I,), depth (I,), gid (I,), kept_counts (C,) i32).

    Stream rows past each Gaussian's range carry the sentinels
    (n_tiles, INT32_MAX, C) and sort to the tail, matching
    bin_gaussians' XLA path bit-for-bit on the non-cull fields."""
    from ..binning import num_tiles as _nt

    tb_x, tb_y = _nt(height, width)
    n_tiles = tb_x * tb_y
    c = cnt.shape[0]
    g_blk = G_BLOCK
    assert n_rows % 128 == 0 and n_rows < 2**24, n_rows
    # largest chunk <= R_CHUNK that divides the budget (so windows never
    # clamp — see kernel comment); budgets are 128-aligned
    r_chunk = min(R_CHUNK, n_rows)
    while n_rows % r_chunk:
        r_chunk -= 128
    c_pad = ((c + g_blk - 1) // g_blk) * g_blk

    cnt = cnt.astype(jnp.int32)
    cum_t = jnp.cumsum(cnt)
    # overflow truncation: the tail (highest gids) past the budget is
    # dropped, partial boundary gaussians emit their in-budget prefix —
    # same semantics as the XLA path's in_range mask; also keeps every
    # window (and so every DMA) inside the io buffer
    cum = jnp.minimum(cum_t, n_rows)
    starts = jnp.minimum(cum_t - cnt, n_rows)

    def pad_c(x, fill):
        return jnp.concatenate(
            [x.astype(jnp.int32),
             jnp.full((c_pad - c,), fill, jnp.int32)]
        )

    cum_pad = jnp.concatenate(
        [cum, jnp.broadcast_to(cum[-1], (c_pad - c,))]
    ).astype(jnp.int32)
    # per-block [w_start, w_end) windows for the SMEM scalar prefetch
    wends = cum_pad.reshape(c_pad // g_blk, g_blk)[:, g_blk - 1]
    win = jnp.stack(
        [jnp.concatenate([jnp.zeros((1,), jnp.int32), wends[:-1]]), wends]
    )
    starts_pad = pad_c(starts, 0)
    # empty padding gaussians: start == end == total
    starts_pad = jnp.where(
        jnp.arange(c_pad) < c, starts_pad, cum_pad
    ).astype(jnp.int32)

    bw = jnp.maximum(tile_max[:, 0] - tile_min[:, 0], 1)
    rows = (
        _bytes(pad_c(starts, 0), 3)
        + _bytes(pad_c(tile_min[:, 0], 0), 2)
        + _bytes(pad_c(tile_min[:, 1], 0), 2)
        + _bytes(pad_c(bw, 1), 2)
        + _bytes(pad_c(depth_bits, 0), 4)
    )
    if cull:
        q16 = lambda v: jnp.clip(
            jnp.round(v * 4.0), -32768, 32767
        ).astype(jnp.int32)
        mxq = pad_c(q16(xys[:, 0]) + 32768, 32768)
        myq = pad_c(q16(xys[:, 1]) + 32768, 32768)
        rows += _bytes(mxq, 2) + _bytes(myq, 2)
        zf = jnp.zeros((c_pad - c,), jnp.float32)
        rows += [
            jnp.concatenate([v.astype(jnp.float32), zf]).astype(jnp.bfloat16)
            for v in (conics[:, 0], conics[:, 1], conics[:, 2], s_max)
        ]
    rows += [jnp.zeros((c_pad,), jnp.bfloat16)] * (_GID_ROW - len(rows))
    # local (within-block) gid bytes: column index modulo the block size
    lid = (jnp.arange(c_pad, dtype=jnp.int32) % g_blk)
    rows += [
        (lid & 255).astype(jnp.bfloat16),
        (lid >> 8).astype(jnp.bfloat16),
    ]
    rows += [jnp.zeros((c_pad,), jnp.bfloat16)] * (_NV - len(rows))
    vals = jnp.stack(rows, axis=0)  # (32, C_pad) bf16

    # 4 sublanes: 3 live planes (tile, depth, gid) + 1 pad — half the
    # per-chunk DMA traffic of an 8-plane buffer (the extra planes were
    # copied in and back out unchanged)
    io0 = jnp.concatenate(
        [
            jnp.full((1, n_rows), n_tiles, jnp.int32),
            jnp.full((1, n_rows), INT_MAX, jnp.int32),
            jnp.full((1, n_rows), c, jnp.int32),
            jnp.zeros((IO_PLANES - 3, n_rows), jnp.int32),
        ],
        axis=0,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c_pad // g_blk,),
        in_specs=[
            pl.BlockSpec((g_blk, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_blk, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_NV, g_blk), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, g_blk), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, IO_PLANES, r_chunk), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    io_out, counts = pl.pallas_call(
        functools.partial(
            _expand_kernel, g_blk=g_blk, r_chunk=r_chunk, n_rows=n_rows,
            tb_x=tb_x, n_tiles=n_tiles, c_sentinel=c, cull=cull,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((IO_PLANES, n_rows), jnp.int32),
            jax.ShapeDtypeStruct((8, c_pad), jnp.float32),
        ],
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        win,
        starts_pad.reshape(c_pad, 1),
        cum_pad.reshape(c_pad, 1),
        vals,
        io0,
    )
    kept = counts[0, :c].astype(jnp.int32)
    return io_out[0], io_out[1], io_out[2], kept
