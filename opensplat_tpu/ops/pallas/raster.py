"""Pallas TPU tile-rasterization kernels (forward + backward).

The TPU-native equivalent of the reference CUDA kernels
(rasterize_forward forward.cu:256-378, rasterize_backward_kernel
backward.cu:161-355), re-designed for the hardware:

  * grid over tiles; each tile loops over its own chunk list with a
    `while_loop` and EXITS EARLY once every pixel is done — the
    dynamic-work saving the XLA flat-stream renderer cannot express;
  * per-isect Gaussian data is stored field-major as (8, I) planes and
    staged HBM -> VMEM with double-buffered async DMA in lane-aligned
    (8, 128) chunks
    (tile ranges are 128-aligned by binning; the analogue of the CUDA
    cooperative shared-memory loads, forward.cu:296-331);
  * compute blocks are (256 pixels x 128 Gaussians): pixels ride the
    sublane axis, Gaussians the lane axis; the sequential front-to-back
    product over a chunk becomes a triangular matmul on the MXU in log
    space (cumulative sums of log(1-alpha)), turning the serial
    dependency into one 256x128x128 matmul per chunk;
  * instead of warp atomics, the backward emits per-intersection
    gradient records (same plane layout), reduced outside with a
    deterministic scatter-add or gid payload-sort segment sum (TPU has
    no atomics; both reductions are deterministic — an improvement over
    CUDA's nondeterministic atomicAdd ordering).

Mosaic constraint: `while_loop` carries must be scalars (vector carries
with changing layouts fail to legalize), so all per-tile vector state
(T, rgb accumulator, final_idx) lives in VMEM scratch refs and the loop
carries only (chunk index, all-done flag).

Early-termination state is carried as the per-pixel global index of the
first transmittance-crossing intersection (`final_idx`), the analogue of
the CUDA kernel's final_index (forward.cu:367-377); the backward replays
back-to-front recovering T by division exactly like backward.cu:300-302,
with the reference's 0.99 alpha-clamp quirk (backward.cu:272).

Input field planes (8 rows — one <=32-byte gather per record outside, and
half the DMA of a 16-plane layout): 0 x, 1 y, 2 conic A, 3 conic B,
4 conic C, 5 opacity, 6 rgb packed as 3x10-bit fixed point (scale 1023/4,
range [0, 4], bitcast into the f32 plane; top two bits zero so the
pattern is never NaN/Inf), 7 zero. Color quantization step is 1/256 —
a ~57 dB PSNR ceiling, far above scene-reconstruction PSNR.
Gradient planes (8 rows, 6 meaningful; bf16 pairs bitcast into f32
planes — finite grads never form NaN/Inf patterns): 0 (v_x | v_y),
1 (v_A | v_B), 2 (v_C | v_opacity), 3 (v_r | v_g), 4 v_b full f32,
5 the gid VALUE plane (f32 2^23 + gid, copied from input row 7 so the
compacted stream stays self-describing), 6..7 zero (HBM slices must
stay 8-sublane-aligned). bf16 keeps the full f32 exponent range and
costs ~0.4% relative precision per contribution (half-ulp
round-to-nearest), far below training noise and the densify threshold's
(2e-4, model.cpp:349) discrimination needs. Packing cuts the gid
payload sort to 6 operands from 10, and the backward writes records
COMPACTED to per-tile processed prefixes (compact_grad_layout), so the
sort runs on ~half the layout stream.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..projection import BLOCK_X, BLOCK_Y
from ..rasterize import ALPHA_THRESH, BWD_ALPHA_CLAMP, FWD_ALPHA_CLAMP, T_EPS

# isects per chunk (lane dim), env-tunable for on-chip A/B: larger K
# halves per-chunk fixed overhead (loop control, DMA setup, state RMW)
# but doubles the triangular-matmul work per isect. Must be a multiple
# of 128 (lane alignment of the chunk DMA windows). 256 measured best
# on v5e (+1.6% whole-step at 131k@512, +0.8% at 1M@1080 vs 128).
K = int(os.environ.get("OPENSPLAT_TPU_RASTER_K", 256))
if K % 128 != 0 or K <= 0:
    # a misaligned K would silently corrupt the K-aligned DMA window
    # math (pl.multiple_of / pl.ds) — fail fast even under python -O
    raise ValueError(
        f"OPENSPLAT_TPU_RASTER_K must be a positive multiple of 128, got {K}"
    )
# chunk-DMA pipeline depth (buffer slots; prefetch distance = NBUF - 1).
# Measured on v5e: depth DOESN'T matter (131k@512: 51.8 steps/s at 2 vs
# 51.3 at 4; 1M@1080 within noise) — the double buffer already hides the
# chunk DMA latency, and extra slots only add semaphore/drain overhead.
# Default stays 2; the knob remains for A/B on other chips.
NBUF = int(os.environ.get("OPENSPLAT_TPU_RASTER_NBUF", 2))
if NBUF < 2:
    raise ValueError(f"OPENSPLAT_TPU_RASTER_NBUF must be >= 2, got {NBUF}")
PIX = BLOCK_X * BLOCK_Y  # 256 pixels per tile (sublane dim)
REC_IN = 8  # input record planes (packed colors; row 7 = 2^23 + gid)
# gradient record planes: 6 meaningful (4 bf16 pairs + v_b + the gid
# value plane) + 2 zero rows — HBM slices must stay 8-sublane-aligned
# (Mosaic tiling); the downstream payload sort reads planes 0..5
REC = 8
REC_USED = 6
COLOR_SCALE = 1023.0 / 4.0  # 10-bit fixed point over [0, 4]


def pack_bf16_pair(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """Two f32 vectors -> one f32 plane carrying (bf16(hi) | bf16(lo)).
    Round-to-nearest-even on both halves."""
    bh = jax.lax.bitcast_convert_type(hi, jnp.int32)
    bl = jax.lax.bitcast_convert_type(lo, jnp.int32)
    rh = (bh + 0x7FFF + ((bh >> 16) & 1)) & jnp.int32(-65536)
    rl = (bl + 0x7FFF + ((bl >> 16) & 1)) >> 16
    return jax.lax.bitcast_convert_type(rh | (rl & 0xFFFF), jnp.float32)


def unpack_bf16_pair(packed: jax.Array):
    """Inverse of pack_bf16_pair -> (hi_f32, lo_f32)."""
    bits = jax.lax.bitcast_convert_type(packed, jnp.int32)
    hi = jax.lax.bitcast_convert_type(bits & jnp.int32(-65536), jnp.float32)
    lo = jax.lax.bitcast_convert_type(bits << 16, jnp.float32)
    return hi, lo
_BIG = 2**30  # python int: jnp scalars would be captured consts in kernels

# TEMPORARY ablation knob (bench-only, wrong output): replace the
# per-pair transcendentals with 2-op polynomials to test whether the
# kernels are transcendental-throughput bound.
if os.environ.get("OPENSPLAT_TPU_FAKE_TRANS"):
    _exp = lambda x: 1.0 + x * 0.5
    _log1p = lambda x: x * 0.99
else:
    _exp = jnp.exp
    _log1p = jnp.log1p
_LOG_T_EPS = float(__import__("math").log(T_EPS))

# prefix/suffix compositing matmuls: OPENSPLAT_TPU_MXU=hilo splits the
# f32 operand into bf16 hi + bf16 residual and runs TWO default-precision
# MXU passes (~2^-17 relative per element) instead of one full-f32
# matmul. MEASURED SLOWER on v5e (131k@512: 48.7 vs 51.4 steps/s e2e) —
# Mosaic's f32 dot is evidently not the 6-pass decomposition the trick
# assumes, and the extra VPU casts dominate. Default stays f32; the knob
# remains for A/B on other chips/Mosaic versions.
_MXU_HILO = os.environ.get("OPENSPLAT_TPU_MXU", "f32") == "hilo"


def _dot_tri(a, m):
    """a @ m for the 0/1 triangular cumulative matrices (see above)."""
    if not _MXU_HILO:
        return jnp.dot(a, m, preferred_element_type=jnp.float32)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    mb = m.astype(jnp.bfloat16)
    return jnp.dot(
        a_hi, mb, preferred_element_type=jnp.float32
    ) + jnp.dot(a_lo, mb, preferred_element_type=jnp.float32)


def _cum_matrices():
    r = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    strict_upper = (r < c).astype(jnp.float32)  # x @ M -> excl prefix per lane
    incl_lower = (r >= c).astype(jnp.float32)  # x @ M -> incl suffix per lane
    strict_lower = (r > c).astype(jnp.float32)  # x @ M -> excl suffix per lane
    return strict_upper, incl_lower, strict_lower


# sigma evaluation backend: "mxu" evaluates the (pixel, gaussian)
# quadratic exponent as ONE (PIX, 8) x (8, K) matmul per chunk — the
# pixel factor is a per-tile CONSTANT (local pixel offsets from the tile
# center), the per-record factor is cheap (1, K)-row math — replacing
# the ~11 VPU ops/pair of the expanded dx/dy chain. Tile-centered
# coordinates keep every product's magnitude at the scale of the
# exponent itself (|terms| <~ 200 for any pair the ellipse cull admits),
# so f32 cancellation error stays ~1e-5 absolute in sigma; exact
# arithmetic guarantees sigma >= 0 (PSD conic), so the matmul result is
# clamped at 0 instead of re-testing the sign (the reference's
# sigma < 0 skip, forward.cu:341, is the same defensive clamp).
# MEASURED NEUTRAL-TO-SLIGHTLY-WORSE on v5e (131k@512: 50.3 vs 51.3
# steps/s; 1M@1080 within noise) — the narrow-contraction matmul costs
# about what the VPU chain it replaces does. Default stays vpu; the
# knob remains for A/B on chips with different MXU/VPU ratios.
_SIGMA_MXU = os.environ.get("OPENSPLAT_TPU_SIGMA", "vpu") == "mxu"

# backward gradient-reduction strategy: "moments" computes the nine
# per-pixel gradient sums as MOMENTS of v_sigma / fac against fixed
# pixel features — ONE (16, PIX) x (PIX, 2K) full-contraction matmul per
# chunk plus (1, K)-row combines in tile-local coordinates — replacing
# the (PIX, 9K) quants concatenate + sublane fold + bf16 hi/lo split +
# ones-matmul (~35 (PIX,K)-sized VPU ops per chunk of products, copies
# and casts). The moment combine is plain f32 (MORE accurate than the
# bf16 two-pass it replaces: worst-case relative error ~xr * 5e-9 from
# the tile-local recombination vs ~2^-17 from bf16 splitting).
# "ones" keeps the previous scheme for A/B.
_BWD_MOMENTS = os.environ.get("OPENSPLAT_TPU_BWD", "moments") == "moments"


def _pixel_quad(tb_x):
    """(PIX, 8) per-tile-constant pixel quadratic features
    [qx^2, qy^2, qx*qy, qx, qy, 1, 0, 0] with qx, qy the pixel offsets
    from the tile center (identical for every tile)."""
    sub = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    qx = (sub % BLOCK_X).astype(jnp.float32) - 0.5 * (BLOCK_X - 1)
    qy = (sub // BLOCK_X).astype(jnp.float32) - 0.5 * (BLOCK_Y - 1)
    one = jnp.ones((PIX, 1), jnp.float32)
    zero = jnp.zeros((PIX, 2), jnp.float32)
    return jnp.concatenate(
        [qx * qx, qy * qy, qx * qy, qx, qy, one, zero], axis=1
    )


def _record_quad(x, y, A, B, C, tcx, tcy):
    """(8, K) per-record quadratic features so that
    sigma = _pixel_quad() @ _record_quad() (see _SIGMA_MXU)."""
    xr = x - tcx
    yr = y - tcy
    return jnp.concatenate(
        [
            0.5 * A,
            0.5 * C,
            B,
            -(A * xr + B * yr),
            -(C * yr + B * xr),
            0.5 * (A * xr * xr + C * yr * yr) + B * xr * yr,
            jnp.zeros((2, x.shape[1]), jnp.float32),
        ],
        axis=0,
    )


def _pixel_coords(t, tb_x):
    sub = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    lx = (sub % BLOCK_X).astype(jnp.float32)
    ly = (sub // BLOCK_X).astype(jnp.float32)
    tox = ((t % tb_x) * BLOCK_X).astype(jnp.float32)
    toy = ((t // tb_x) * BLOCK_Y).astype(jnp.float32)
    return tox + lx, toy + ly  # (PIX, 1) each


def _chunk_fields(buf):
    """(8, K) packed record planes -> per-field (1, K) rows."""
    x = buf[0:1, :]
    y = buf[1:2, :]
    A = buf[2:3, :]
    B = buf[3:4, :]
    C = buf[4:5, :]
    op = buf[5:6, :]
    bits = jax.lax.bitcast_convert_type(buf[6:7, :], jnp.int32)
    inv = 1.0 / COLOR_SCALE
    col_r = ((bits >> 20) & 0x3FF).astype(jnp.float32) * inv
    col_g = ((bits >> 10) & 0x3FF).astype(jnp.float32) * inv
    col_b = (bits & 0x3FF).astype(jnp.float32) * inv
    col = jnp.concatenate([col_r, col_g, col_b], axis=0)  # (3, K)
    return x, y, A, B, C, op, col


def _fwd_kernel(start_ref, end_ref, recs_hbm, acc_ref, fidx_ref,
                buf, state, fidx_s, sem, *, tb_x):
    # state (PIX, 8) f32: col 0 = T, cols 1:4 = rgb accum, col 4 = done flag
    t = pl.program_id(0)
    start = start_ref[t]
    end = end_ref[t]
    # tile ranges need NO alignment: chunks start at the floor-128 base
    # and lanes outside [start, end) are masked — the leading overhang
    # belongs to the previous tile's tail (valid memory)
    base0 = pl.multiple_of(start - jax.lax.rem(start, K), K)
    n_chunks = jnp.where(end > start, pl.cdiv(end - base0, K), 0)
    if _SIGMA_MXU:
        P_quad = _pixel_quad(tb_x)
        tcx = ((t % tb_x) * BLOCK_X + 0.5 * (BLOCK_X - 1)).astype(jnp.float32)
        tcy = ((t // tb_x) * BLOCK_Y + 0.5 * (BLOCK_Y - 1)).astype(jnp.float32)
    else:
        px, py = _pixel_coords(t, tb_x)
    M_excl, _, _ = _cum_matrices()
    n_recs = recs_hbm.shape[1]

    state[:, :] = jnp.zeros((PIX, 8), jnp.float32)
    state[:, 0:1] = jnp.ones((PIX, 1), jnp.float32)
    fidx_s[:, :] = jnp.full((PIX, 1), _BIG, jnp.int32)

    # NBUF-deep chunk-DMA pipeline: slot i%NBUF holds chunk i; chunks
    # i+1..i+NBUF-1 are in flight while chunk i computes (per-chunk HBM
    # latency exceeds per-chunk compute, so depth 1 serialized the loop).
    # Prefetch addresses are clamped into the record table — reading a
    # stranger tile's records is harmless, the compute masks by bounds.
    def _chunk_dma(i, slot):
        base = pl.multiple_of(
            jnp.minimum(base0 + i * K, n_recs - K), K
        )
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
        x, y, A, B, C, op, col = _chunk_fields(buf[slot])

        T_carry = state[:, 0:1]
        rgb = state[:, 1:4]
        done = state[:, 4:5] > 0.0
        fidx = fidx_s[:, :]

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
        row_gk = base + lane
        row_valid = (row_gk >= start) & (row_gk < end)  # (1, K)
        if _SIGMA_MXU:
            F = _record_quad(x, y, A, B, C, tcx, tcy)
            sigma = jnp.maximum(
                jnp.dot(P_quad, F, preferred_element_type=jnp.float32), 0.0
            )
            sig_ok = row_valid
        else:
            dx = x - px  # (PIX, K)
            dy = y - py
            sigma = 0.5 * (A * dx * dx + C * dy * dy) + B * dx * dy
            sig_ok = row_valid & (sigma >= 0.0)
        alpha = jnp.minimum(FWD_ALPHA_CLAMP, op * _exp(-sigma))
        used = sig_ok & (alpha >= ALPHA_THRESH) & jnp.logical_not(done)
        a = jnp.where(used, alpha, 0.0)
        la = _log1p(-a)
        excl = _dot_tri(la, M_excl)
        # stop test in log space (saves the exp the Tb formulation
        # needed): T_carry*exp(excl)*(1-a) <= T_EPS  <=>
        # log(T_carry) + excl + la <= log(T_EPS)
        logT = jnp.log(jnp.maximum(T_carry, 1e-37))
        stop = used & (logT + excl + la <= _LOG_T_EPS)

        gk = base + jax.lax.broadcasted_iota(jnp.int32, (PIX, K), 1)
        stop_at = jnp.min(jnp.where(stop, gk, _BIG), axis=1, keepdims=True)
        fidx = jnp.minimum(fidx, stop_at)  # (PIX, 1)

        # masking lanes at gk >= fidx needs NO second prefix matmul: a
        # composited lane k < fidx only sums la over j < k < fidx — all
        # unmasked — so excl_eff == excl there EXACTLY, and masked lanes
        # are zeroed by a_eff anyway. (The earlier lax.cond second-pass
        # recompute was algebraically redundant.)
        comp_m = used & (gk < fidx)
        a_eff = jnp.where(comp_m, a, 0.0)
        la_eff = jnp.where(comp_m, la, 0.0)
        vis = a_eff * T_carry * _exp(excl)  # (PIX, K)
        rgb = rgb + jnp.dot(vis, col.T, preferred_element_type=jnp.float32)
        T_carry = T_carry * _exp(jnp.sum(la_eff, axis=1, keepdims=True))
        done_new = done | jnp.any(stop, axis=1, keepdims=True)

        state[:, 0:1] = T_carry
        state[:, 1:4] = rgb
        state[:, 4:5] = done_new.astype(jnp.float32)
        fidx_s[:, :] = fidx
        return i + 1, jnp.all(done_new)

    def cond(carry):
        i, all_done = carry
        return (i < n_chunks) & jnp.logical_not(all_done)

    final_i, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.zeros((), bool))
    )
    # drain the outstanding prefetches (chunks final_i..final_i+NBUF-2,
    # started by the prologue or the last executed bodies) before the
    # scratch is reused by the next grid step
    for d in range(NBUF - 1):
        _chunk_dma(final_i + d, jax.lax.rem(final_i + d, NBUF)).wait()

    packed = jnp.concatenate(
        [state[:, 1:4], state[:, 0:1], jnp.zeros((PIX, 4), jnp.float32)], axis=1
    )  # (PIX, 8): [r, g, b, T, 0...]
    acc_ref[0, :, :] = packed.T
    fidx_ref[0, :, :] = fidx_s[:, :].reshape(1, PIX)


@functools.partial(jax.jit, static_argnames=("tb_x", "tb_y", "interpret"))
def pallas_rasterize_forward(recs, tile_start, tile_end, tb_x: int, tb_y: int,
                             interpret: bool = False):
    """recs: (8, I) packed field planes, tile ranges 128-aligned.
    Returns (acc (T, 8, 256) rows [r,g,b,T,0..], fidx (T, 1, 256) int32)."""
    n_tiles = tb_x * tb_y
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, 8, PIX), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PIX), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((NBUF, REC_IN, K), jnp.float32),
            pltpu.VMEM((PIX, 8), jnp.float32),
            pltpu.VMEM((PIX, 1), jnp.int32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    acc, fidx = pl.pallas_call(
        functools.partial(_fwd_kernel, tb_x=tb_x),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 8, PIX), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, PIX), jnp.int32),
        ],
        interpret=interpret,
    )(tile_start, tile_end, recs)
    return acc, fidx


def compact_grad_layout(tile_start, tile_end, fidx):
    """Per-tile compact bases for the backward's gradient records.

    Returns (comp_start (T,) int32, comp_total () int32). Mirrors
    _bwd_kernel's early-exit replay limit EXACTLY (chunks past the last
    contributing record are never written, backward.cu:196-253 analogue):
    tile t emits cdiv(glim - floor_K(start), K) K-wide chunks, where glim
    is capped by the max per-pixel final_idx. comp_total is the adaptive
    grad-budget demand (typically ~0.5x the layout stream at training
    opacities, measured on v5e at 1M@1080)."""
    count = tile_end - tile_start
    f = fidx.reshape(fidx.shape[0], -1).astype(jnp.int32)  # (T, PIX)
    eff = jnp.where(f >= _BIG, count[:, None], f - tile_start[:, None])
    glim = tile_start + jnp.minimum(jnp.max(eff, axis=1), count)
    base0 = tile_start - jax.lax.rem(tile_start, K)
    nch = jnp.where(glim > base0, (glim - base0 + K - 1) // K, 0)
    sizes = (nch * K).astype(jnp.int32)
    ccum = jnp.cumsum(sizes)
    return (ccum - sizes).astype(jnp.int32), ccum[-1]


def _bwd_kernel(
    start_ref, end_ref, comp_ref, recs_hbm, cot_ref, fidx_ref, zeros_hbm,
    grads_hbm, buf, gbuf, state, sem, gsem, *, tb_x, grad_n,
):
    del zeros_hbm  # aliased with grads_hbm; only the alias matters
    # state (PIX, 8): col 0 = T_run, col 1 = buf_dot (running
    # suffix-composited color dotted with the pixel's rgb cotangent)
    t = pl.program_id(0)
    start = start_ref[t]
    end = end_ref[t]
    count = end - start
    base0 = pl.multiple_of(start - jax.lax.rem(start, K), K)
    # gradient records write COMPACTED: tile t's chunk i lands at
    # comp_start[t] + i*K in the (REC, grad_n + K) output — per-tile
    # regions are disjoint (no boundary RMW) and sized by the forward's
    # early-termination replay limit, so the downstream payload sort runs
    # on the processed prefix only (~0.5x the layout stream, measured).
    # Chunks past the static budget redirect to the trash chunk at
    # grad_n with ZERO gradients (never silent: the caller reports the
    # true compact demand for regrow feedback).
    comp0 = comp_ref[t]
    px, py = _pixel_coords(t, tb_x)
    # tile center for the tile-local coordinates the moment/matmul paths
    # use (magnitudes stay at exponent scale — see _SIGMA_MXU)
    tcx = ((t % tb_x) * BLOCK_X + 0.5 * (BLOCK_X - 1)).astype(jnp.float32)
    tcy = ((t // tb_x) * BLOCK_Y + 0.5 * (BLOCK_Y - 1)).astype(jnp.float32)
    if _SIGMA_MXU:
        # sigma must be BIT-IDENTICAL to the forward's (the fidx replay
        # depends on which pairs pass the alpha threshold): same matmul,
        # same clamp.
        P_quad = _pixel_quad(tb_x)
    _, M_sfx_incl, M_sfx_excl = _cum_matrices()

    cot = cot_ref[0, :, :].T  # (PIX, 8): [v_r, v_g, v_b, v_ft, T_final, bg_dot]
    v_r = cot[:, 0:1]
    v_g = cot[:, 1:2]
    v_b = cot[:, 2:3]
    T_final = cot[:, 4:5]
    # the final-T and background cotangents enter v_alpha only through
    # -T_final * ra * (v_oa + bg_dot): fold them once per tile
    vob = T_final * (cot[:, 3:4] + cot[:, 5:6])  # (PIX, 1)
    fidx = fidx_ref[0, :, :].reshape(PIX, 1)

    if _BWD_MOMENTS:
        # (16, PIX) moment features: rows [1, qx, qy, qx^2, qy^2, qx*qy,
        # 0, 0, v_r, v_g, v_b, 0 x5] with qx, qy the pixel offsets from
        # the tile center. Built from the UNtransposed cot rows (no
        # extra transpose). The nine gradient reductions below are exact
        # linear combinations of dot(W16T, [v_sigma | fac]).
        lane_p = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
        qx_r = (lane_p % BLOCK_X).astype(jnp.float32) - 0.5 * (BLOCK_X - 1)
        qy_r = (lane_p // BLOCK_X).astype(jnp.float32) - 0.5 * (BLOCK_Y - 1)
        W16T = jnp.concatenate(
            [
                jnp.ones((1, PIX), jnp.float32),
                qx_r,
                qy_r,
                qx_r * qx_r,
                qy_r * qy_r,
                qx_r * qy_r,
                jnp.zeros((2, PIX), jnp.float32),
                cot_ref[0, 0:3, :],  # v_r, v_g, v_b rows
                jnp.zeros((5, PIX), jnp.float32),
            ],
            axis=0,
        )

    # early skip, the analogue of the CUDA warp_bin_final trick
    # (backward.cu:196-253): records at global index >= fidx never
    # composited, so chunks past the tile's last contributing record
    # need no replay. Their gradient slots stay zero thanks to the
    # zero-initialized, input-output-aliased output buffer.
    eff = jnp.where(fidx >= _BIG, count, fidx - start)  # (PIX, 1)
    glim = start + jnp.minimum(jnp.max(eff), count)  # last record + 1
    n_chunks = jnp.where(glim > base0, pl.cdiv(glim - base0, K), 0)
    n_recs = recs_hbm.shape[1]

    state[:, :] = jnp.zeros((PIX, 8), jnp.float32)
    state[:, 0:1] = T_final

    # NBUF-deep DMA pipelines on both sides: chunks i-1..i-(NBUF-1)
    # prefetch while chunk i computes, and each chunk's gradient record
    # writes back asynchronously (waited only when its slot is reused).
    def _in_dma(j, slot):
        i = n_chunks - 1 - j
        base = pl.multiple_of(
            jnp.clip(base0 + i * K, 0, n_recs - K), K
        )
        return pltpu.make_async_copy(
            recs_hbm.at[:, pl.ds(base, K)], buf.at[slot], sem.at[slot]
        )

    def _out_dma(j, slot):
        i = n_chunks - 1 - j
        tgt = pl.multiple_of(
            jnp.minimum(comp0 + i * K, jnp.int32(grad_n)), K
        )
        return pltpu.make_async_copy(
            gbuf.at[slot], grads_hbm.at[:, pl.ds(tgt, K)], gsem.at[slot]
        )

    for d in range(NBUF - 1):
        _in_dma(jnp.int32(d), jnp.int32(d)).start()

    def body(carry):
        j = carry
        i = n_chunks - 1 - j
        slot = jax.lax.rem(j, NBUF)
        _in_dma(j + NBUF - 1, jax.lax.rem(j + NBUF - 1, NBUF)).start()
        _in_dma(j, slot).wait()
        base = pl.multiple_of(base0 + i * K, K)
        x, y, A, B, C, op, col = _chunk_fields(buf[slot])
        col_r = col[0:1, :]
        col_g = col[1:2, :]
        col_b = col[2:3, :]

        T_run = state[:, 0:1]
        buf_dot = state[:, 1:2]

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
        row_gk = base + lane
        row_valid = (row_gk >= start) & (row_gk < end)
        if _SIGMA_MXU:
            F = _record_quad(x, y, A, B, C, tcx, tcy)
            sigma = jnp.maximum(
                jnp.dot(P_quad, F, preferred_element_type=jnp.float32), 0.0
            )
            sig_ok = row_valid
        else:
            dx = x - px
            dy = y - py
            sigma = 0.5 * (A * dx * dx + C * dy * dy) + B * dx * dy
            sig_ok = row_valid & (sigma >= 0.0)
        vis_u = _exp(-sigma)
        alpha_f = jnp.minimum(FWD_ALPHA_CLAMP, op * vis_u)
        gk = base + jax.lax.broadcasted_iota(jnp.int32, (PIX, K), 1)
        comp = sig_ok & (alpha_f >= ALPHA_THRESH) & (gk < fidx)

        alpha_b = jnp.where(comp, jnp.minimum(BWD_ALPHA_CLAMP, op * vis_u), 0.0)
        lra = -_log1p(-alpha_b)
        ra = 1.0 / (1.0 - alpha_b)  # == exp(lra), one reciprocal cheaper
        sfx = _dot_tri(lra, M_sfx_incl)
        T_k = T_run * _exp(sfx)  # (PIX, K)
        fac = alpha_b * T_k

        # bk_r/g/b (per-channel suffix sums of the composited color,
        # backward.cu:306-321) enter v_alpha only through the dot product
        # sum_c bk_c * v_c; since v_r/v_g/v_b are lane-constant per pixel,
        # that dot equals suffix_excl(fac * w) + buf_dot with
        # w = sum_c col_c * v_c — ONE (PIX, K) suffix matmul instead of a
        # (3*PIX, K) one (halves the kernel's MXU work), and the running
        # 3-channel buffer collapses to one scalar per pixel
        w = col_r * v_r + col_g * v_g + col_b * v_b  # (PIX, K)
        facw = fac * w
        bkd = buf_dot + _dot_tri(facw, M_sfx_excl)

        v_alpha = T_k * w - ra * (bkd + vob)
        v_alpha = jnp.where(comp, v_alpha, 0.0)
        v_sigma = -op * vis_u * v_alpha  # (PIX, K)

        if _BWD_MOMENTS:
            # nine pixel reductions as MOMENTS (see _BWD_MOMENTS): one
            # full-contraction matmul, then tile-local (1, K) combines.
            # Sign conventions from the quants they replace:
            #   g_x  = sum_p v_sigma (A dx + B dy),  dx = xr - qx
            #   g_A  = 0.5 sum_p v_sigma dx^2, ... (conic grads)
            #   g_op = sum_p vis_u v_alpha = -m0 / op
            #   g_c  = sum_p fac v_c (colors)
            M16 = jnp.dot(
                W16T, jnp.concatenate([v_sigma, fac], axis=1),
                preferred_element_type=jnp.float32,
            )  # (16, 2K)
            m0 = M16[0:1, :K]
            m_x = M16[1:2, :K]
            m_y = M16[2:3, :K]
            m_x2 = M16[3:4, :K]
            m_y2 = M16[4:5, :K]
            m_xy = M16[5:6, :K]
            g_r = M16[8:9, K:]
            g_g = M16[9:10, K:]
            g_b = M16[10:11, K:]
            xr = x - tcx  # (1, K); dx = xr - qx per pixel
            yr = y - tcy
            sx = xr * m0 - m_x  # sum_p v_sigma dx
            sy = yr * m0 - m_y
            g_x = A * sx + B * sy
            g_y = B * sx + C * sy
            g_A = 0.5 * (xr * xr * m0 - 2.0 * xr * m_x + m_x2)
            g_B = 0.5 * (xr * yr * m0 - xr * m_y - yr * m_x + m_xy)
            g_C = 0.5 * (yr * yr * m0 - 2.0 * yr * m_y + m_y2)
            # padding lanes have op == 0 and v_sigma == 0 -> 0, not NaN
            g_op = -m0 / jnp.maximum(op, 1e-12)
        else:
            # previous scheme: all nine reductions in ONE ones-vector
            # matmul ((1, PIX) x (PIX, 9K)) over an explicit quants block
            if _SIGMA_MXU:
                dx = x - px
                dy = y - py
            quants = jnp.concatenate(
                [
                    v_sigma * (A * dx + B * dy),
                    v_sigma * (B * dx + C * dy),
                    0.5 * v_sigma * dx * dx,
                    0.5 * v_sigma * dx * dy,
                    0.5 * v_sigma * dy * dy,
                    vis_u * v_alpha,
                    fac * v_r,
                    fac * v_g,
                    fac * v_b,
                ],
                axis=1,
            )  # (PIX, 9K)
            # pixel reduction at near-f32 accuracy in TWO bf16 passes:
            # fold the sublanes once (one f32 add — a reduction
            # reordering), then split into bf16 hi + bf16 residual and
            # sum each with a DEFAULT-precision ones matmul (f32
            # accumulation, ~2^-17 relative per term).
            half = PIX // 2
            q128 = quants[0:half, :] + quants[half:PIX, :]  # (128, 9K)
            q_hi = q128.astype(jnp.bfloat16)
            q_lo = (q128 - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            ones = jnp.ones((1, half), jnp.bfloat16)
            sums = jnp.dot(
                ones, q_hi, preferred_element_type=jnp.float32
            ) + jnp.dot(
                ones, q_lo, preferred_element_type=jnp.float32
            )  # (1, 9K)
            g_x, g_y, g_A, g_B, g_C, g_op, g_r, g_g, g_b = (
                sums[:, k * K:(k + 1) * K] for k in range(9)
            )
        # chunks whose compact target falls past the budget redirect to
        # the trash chunk with zeroed gradients (real gids + zero grads
        # contribute nothing to the segment sums). Masking happens on the
        # UNPACKED f32 values — arithmetic on packed bf16-pair planes
        # could flush denormal bit patterns.
        keep_f = jnp.where(
            comp0 + i * K >= jnp.int32(grad_n), 0.0, 1.0
        )
        # sanitize: a single nonfinite record (degenerate splats — e.g.
        # scale ratios ~1e5 after thousands of steps — can overflow the
        # f32 gradient chain) would poison its ENTIRE segment-sum block
        # downstream (NaN x 0 = NaN through the one-hot matmul) and from
        # there 512 Gaussians' parameters. Zero it at the source: the
        # droplet of lost gradient is confined to the bad splat itself.
        g_x, g_y, g_A, g_B, g_C, g_op, g_r, g_g, g_b = (
            jnp.where(jnp.isfinite(v), v, 0.0) * keep_f
            for v in (g_x, g_y, g_A, g_B, g_C, g_op, g_r, g_g, g_b)
        )
        grec = jnp.concatenate(
            [
                pack_bf16_pair(g_x, g_y),
                pack_bf16_pair(g_A, g_B),
                pack_bf16_pair(g_C, g_op),
                pack_bf16_pair(g_r, g_g),
                g_b,
                # gid plane: f32 VALUE 2^23 + gid from the record table
                # (raster.py row 7) — the payload sort keys on it and the
                # segment sum recovers gid by subtraction; the +2^23 bias
                # keeps the plane normal (raw gid bit patterns are f32
                # denormals, which XLA flushes in data movement)
                buf[slot][7:8, :],
                jnp.zeros((REC - REC_USED, K), jnp.float32),
            ],
            axis=0,
        )

        # this slot's previous write-back must land before overwriting
        @pl.when(j >= NBUF)
        def _():
            _out_dma(j - NBUF, slot).wait()

        gbuf[slot] = grec
        _out_dma(j, slot).start()

        state[:, 0:1] = T_run * _exp(jnp.sum(lra, axis=1, keepdims=True))
        state[:, 1:2] = buf_dot + jnp.sum(facw, axis=1, keepdims=True)
        return j + 1

    def cond(j):
        return j < n_chunks

    j_end = jax.lax.while_loop(cond, body, jnp.int32(0))
    # drain: the outstanding input prefetches + the last NBUF write-backs
    for d in range(NBUF - 1):
        _in_dma(j_end + d, jax.lax.rem(j_end + d, NBUF)).wait()

    for d in range(1, NBUF + 1):
        @pl.when(j_end >= d)
        def _(d=d):
            _out_dma(j_end - d, jax.lax.rem(j_end - d, NBUF)).wait()


@functools.partial(
    jax.jit, static_argnames=("tb_x", "tb_y", "grad_n", "interpret")
)
def pallas_rasterize_backward(recs, tile_start, tile_end, comp_start, cot,
                              fidx, tb_x: int, tb_y: int, grad_n: int,
                              interpret: bool = False):
    """cot: (T, 8, 256) rows [v_r, v_g, v_b, v_final_t, T_final, bg_dot, 0, 0].
    comp_start: (T,) int32 K-aligned compact bases (tile t's chunk i
    writes at comp_start[t] + i*K; disjoint per-tile regions sized by the
    early-termination replay limit — see compact_grad_layout).
    Returns COMPACTED gradient planes (REC, grad_n): rows 0-4 packed
    gradients, row 5 the gid value plane (2^23 + gid), unwritten tail
    rows all-zero (gid value 0 -> recovered id is negative, excluded by
    every reduction). A trailing trash chunk absorbs over-budget
    redirects and is sliced off."""
    n_tiles = tb_x * tb_y
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, PIX), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PIX), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((NBUF, REC_IN, K), jnp.float32),
            pltpu.VMEM((NBUF, REC, K), jnp.float32),
            pltpu.VMEM((PIX, 8), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    zeros_out = jnp.zeros((REC, grad_n + K), jnp.float32)
    grads = pl.pallas_call(
        functools.partial(_bwd_kernel, tb_x=tb_x, grad_n=grad_n),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((REC, grad_n + K), jnp.float32)],
        # the zeros input aliases the output: chunks skipped by the
        # early-exit replay keep zero gradients
        input_output_aliases={6: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tile_start, tile_end, comp_start, recs, cot, fidx, zeros_out)
    return grads[0][:, :grad_n]
