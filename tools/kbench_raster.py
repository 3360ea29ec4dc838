#!/usr/bin/env python
"""Ablation bench for the Pallas forward rasterization kernel.

e2e A/Bs at 1M@1080 showed the kernel time is INVARIANT to chunk size K,
to VPU-op count (sigma-MXU), and to DMA pipeline depth (NBUF) — so this
harness times kernel VARIANTS with pieces removed to locate the real
per-chunk cost: the triangular matmul, the transcendentals (exp/log1p),
the stop/early-exit bookkeeping, or the loop/DMA skeleton itself.

Synthetic-but-realistic stream: T tiles x ~I/T isects each, opacities
and conics shaped like a mid-training scene. Calls are CHAINED (each
iteration's input depends on the previous output) so the tunnel cannot
replay results; one block_until_ready at the end.

    python tools/kbench_raster.py            # all variants
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opensplat_tpu.ops.pallas import raster as R

K = R.K
PIX = R.PIX
NBUF = R.NBUF
REC_IN = R.REC_IN


def make_stream(n_tiles=1024, per_tile=1074, tb_x=32, seed=0):
    rng = np.random.default_rng(seed)
    I = n_tiles * per_tile
    Ipad = ((I + K - 1) // K) * K
    tx = (np.arange(n_tiles) % tb_x) * 16
    ty = (np.arange(n_tiles) // tb_x) * 16
    # per-isect fields, tile-major
    tile_of = np.repeat(np.arange(n_tiles), per_tile)
    x = tx[tile_of] + rng.uniform(-6, 22, I)
    y = ty[tile_of] + rng.uniform(-6, 22, I)
    s = rng.uniform(0.8, 4.0, I)
    A = 1.0 / (s * s)
    C = 1.0 / (s * s) * rng.uniform(0.7, 1.4, I)
    B = rng.uniform(-0.2, 0.2, I) * np.sqrt(A * C)
    op = rng.uniform(0.03, 0.95, I)
    q = rng.integers(0, 1024, (I, 3))
    packed = (q[:, 0] << 20) | (q[:, 1] << 10) | q[:, 2]
    packed_f = packed.astype(np.int32).view(np.float32)
    gid = (2.0 ** 23) + rng.integers(0, 131072, I).astype(np.float32)
    recs = np.zeros((REC_IN, Ipad), np.float32)
    recs[0, :I] = x
    recs[1, :I] = y
    recs[2, :I] = A
    recs[3, :I] = B
    recs[4, :I] = C
    recs[5, :I] = op
    recs[6, :I] = packed_f
    recs[7, :I] = gid
    tile_start = (np.arange(n_tiles) * per_tile).astype(np.int32)
    tile_end = tile_start + per_tile
    return jnp.asarray(recs), jnp.asarray(tile_start), jnp.asarray(tile_end)


def build_variant(name):
    """A pallas_call like pallas_rasterize_forward but with `name` pieces
    ablated. Returns f(recs, ts, te, tb_x, tb_y) -> acc."""

    def fwd_kernel(start_ref, end_ref, recs_hbm, acc_ref, fidx_ref,
                   buf, state, fidx_s, sem, *, tb_x):
        t = pl.program_id(0)
        start = start_ref[t]
        end = end_ref[t]
        base0 = pl.multiple_of(start - jax.lax.rem(start, K), K)
        n_chunks = jnp.where(end > start, pl.cdiv(end - base0, K), 0)
        P_quad = R._pixel_quad(tb_x)
        tcx = ((t % tb_x) * 16 + 7.5).astype(jnp.float32)
        tcy = ((t // tb_x) * 16 + 7.5).astype(jnp.float32)
        M_excl, _, _ = R._cum_matrices()
        n_recs = recs_hbm.shape[1]

        state[:, :] = jnp.zeros((PIX, 8), jnp.float32)
        state[:, 0:1] = jnp.ones((PIX, 1), jnp.float32)
        fidx_s[:, :] = jnp.full((PIX, 1), R._BIG, jnp.int32)

        def _chunk_dma(i, slot):
            base = pl.multiple_of(jnp.minimum(base0 + i * K, n_recs - K), K)
            return pltpu.make_async_copy(
                recs_hbm.at[:, pl.ds(base, K)], buf.at[slot], sem.at[slot]
            )

        for d in range(NBUF - 1):
            _chunk_dma(jnp.int32(d), jnp.int32(d)).start()

        def body(carry):
            i, _ = carry
            slot = jax.lax.rem(i, NBUF)
            _chunk_dma(i + NBUF - 1, jax.lax.rem(i + NBUF - 1, NBUF)).start()
            _chunk_dma(i, slot).wait()
            base = pl.multiple_of(base0 + i * K, K)

            if name == "skeleton":
                # DMA + loop only: consume the buffer minimally
                state[:, 0:1] = state[:, 0:1] + buf[slot][0:1, 0:1].T
                return i + 1, jnp.zeros((), bool)

            x, y, A, B, C, op, col = R._chunk_fields(buf[slot])
            T_carry = state[:, 0:1]
            rgb = state[:, 1:4]
            done = state[:, 4:5] > 0.0
            fidx = fidx_s[:, :]

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
            row_gk = base + lane
            row_valid = (row_gk >= start) & (row_gk < end)
            F = R._record_quad(x, y, A, B, C, tcx, tcy)
            sigma = jnp.maximum(
                jnp.dot(P_quad, F, preferred_element_type=jnp.float32), 0.0
            )
            if name == "notrans":
                alpha = jnp.minimum(R.FWD_ALPHA_CLAMP,
                                    op * (1.0 - 0.05 * sigma))
            else:
                alpha = jnp.minimum(R.FWD_ALPHA_CLAMP, op * jnp.exp(-sigma))
            used = row_valid & (alpha >= R.ALPHA_THRESH) & jnp.logical_not(done)
            a = jnp.where(used, alpha, 0.0)
            if name == "notrans":
                la = -a
            else:
                la = jnp.log1p(-a)
            if name == "nomatmul":
                excl = la
            else:
                excl = R._dot_tri(la, M_excl)

            if name == "nostop":
                stop = jnp.zeros_like(used)
                a_eff, la_eff, excl_eff = a, la, excl
                fidx_new = fidx
            else:
                logT = jnp.log(jnp.maximum(T_carry, 1e-37))
                stop = used & (logT + excl + la <= R._LOG_T_EPS)
                gk = base + jax.lax.broadcasted_iota(jnp.int32, (PIX, K), 1)
                stop_at = jnp.min(jnp.where(stop, gk, R._BIG), axis=1,
                                  keepdims=True)
                fidx_new = jnp.minimum(fidx, stop_at)

                def _with_stop():
                    comp = used & (gk < fidx_new)
                    a_e = jnp.where(comp, a, 0.0)
                    la_e = jnp.log1p(-a_e) if name != "notrans" else -a_e
                    ex_e = (R._dot_tri(la_e, M_excl)
                            if name != "nomatmul" else la_e)
                    return a_e, la_e, ex_e

                a_eff, la_eff, excl_eff = jax.lax.cond(
                    jnp.any(stop), _with_stop, lambda: (a, la, excl)
                )
            if name == "notrans":
                vis = a_eff * T_carry * (1.0 + excl_eff)
            else:
                vis = a_eff * T_carry * jnp.exp(excl_eff)
            rgb = rgb + jnp.dot(vis, col.T, preferred_element_type=jnp.float32)
            if name == "notrans":
                T_carry = T_carry * (1.0 + jnp.sum(la_eff, axis=1,
                                                   keepdims=True) * 1e-6)
            else:
                T_carry = T_carry * jnp.exp(jnp.sum(la_eff, axis=1,
                                                    keepdims=True))
            done_new = done | jnp.any(stop, axis=1, keepdims=True)
            state[:, 0:1] = T_carry
            state[:, 1:4] = rgb
            state[:, 4:5] = done_new.astype(jnp.float32)
            fidx_s[:, :] = fidx_new
            return i + 1, jnp.all(done_new)

        def cond(carry):
            i, all_done = carry
            return (i < n_chunks) & jnp.logical_not(all_done)

        final_i, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.zeros((), bool))
        )
        for d in range(NBUF - 1):
            _chunk_dma(final_i + d, jax.lax.rem(final_i + d, NBUF)).wait()

        packed = jnp.concatenate(
            [state[:, 1:4], state[:, 0:1], jnp.zeros((PIX, 4), jnp.float32)],
            axis=1,
        )
        acc_ref[0, :, :] = packed.T
        fidx_ref[0, :, :] = fidx_s[:, :].reshape(1, PIX)

    @functools.partial(jax.jit, static_argnames=("tb_x", "tb_y"))
    def run(recs, ts, te, tb_x, tb_y):
        n_tiles = tb_x * tb_y
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec((1, 8, PIX), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, PIX), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((NBUF, REC_IN, K), jnp.float32),
                pltpu.VMEM((PIX, 8), jnp.float32),
                pltpu.VMEM((PIX, 1), jnp.int32),
                pltpu.SemaphoreType.DMA((NBUF,)),
            ],
        )
        acc, fidx = pl.pallas_call(
            functools.partial(fwd_kernel, tb_x=tb_x),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles, 8, PIX), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, 1, PIX), jnp.int32),
            ],
        )(ts, te, recs)
        return acc

    return run


def main():
    tb_x = tb_y = 32
    recs, ts, te = make_stream(n_tiles=tb_x * tb_y)
    n_iters = int(os.environ.get("KB_ITERS", 30))
    variants = os.environ.get(
        "KB_VARIANTS", "full,nomatmul,notrans,nostop,skeleton"
    ).split(",")
    for name in variants:
        if name == "real":
            def run(recs, ts, te, tb_x, tb_y):
                acc, _ = R.pallas_rasterize_forward(recs, ts, te, tb_x, tb_y)
                return acc
        else:
            run = build_variant(name)
        acc = run(recs, ts, te, tb_x, tb_y)
        jax.block_until_ready(acc)
        # chained: each iteration's input depends on the previous output
        r = recs
        t0 = time.perf_counter()
        for _ in range(n_iters):
            r = r.at[5, 0].add(acc[0, 0, 0] * 1e-30)
            acc = run(r, ts, te, tb_x, tb_y)
        jax.block_until_ready(acc)
        dt = (time.perf_counter() - t0) / n_iters
        print(f"{name:10s} {dt * 1e3:8.3f} ms/call "
              f"({ts.shape[0]} tiles, {recs.shape[1]} isects)")


if __name__ == "__main__":
    main()
