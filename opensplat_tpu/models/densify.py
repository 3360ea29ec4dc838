"""Densify / duplicate / cull / alpha-reset under fixed capacity.

Reproduces the reference state machine (Model::afterTrain,
model.cpp:311-494) exactly — thresholds, 1.6 split factor, 2 samples,
split-parent culling, the updated-scales ordering of the dup test, and
the reset schedule guard — but re-architected for jit: instead of
re-allocating tensors, new Gaussians are scattered into dead capacity
slots and culled ones are masked dead. The host decides WHICH jitted
variant to run (densify / reset are host-known functions of the step) and
grows capacity ahead of time via `count_refine_needs`.

All parity-relevant quirks preserved:
  * on the first accumulation after a refine, vis_counts is set to 1 for
    ALL Gaussians (even invisible), matching model.cpp:321-323;
  * split sample positions use the PRE-shrink scales, the dup test uses
    the POST-shrink scales (model.cpp:360-378 execution order);
  * the opacity/size cull applies to the just-added Gaussians too
    (cull mask computed on the concatenated set, model.cpp:429).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.tensor_math import quat_to_rotmat
from .gaussians import DensifyStats, GaussianParams, TrainState, zero_stats


def accumulate_stats(
    stats: DensifyStats,
    xys_grad: jax.Array,
    radii: jax.Array,
    height: int,
    width: int,
) -> DensifyStats:
    """Per-step densification statistics (model.cpp:317-337).

    Only called while step < stop_split_at (host-side condition)."""
    visible = radii > 0
    grads = jnp.linalg.norm(xys_grad, axis=-1)
    init = ~stats.initialized
    new_norm = jnp.where(
        init, grads, jnp.where(visible, stats.xys_grad_norm + grads, stats.xys_grad_norm)
    )
    new_counts = jnp.where(
        init,
        jnp.ones_like(stats.vis_counts),
        jnp.where(visible, stats.vis_counts + 1.0, stats.vis_counts),
    )
    size = radii.astype(jnp.float32) / float(max(height, width))
    new_max2d = jnp.where(visible, jnp.maximum(stats.max_2d_size, size), stats.max_2d_size)
    return DensifyStats(
        xys_grad_norm=new_norm,
        vis_counts=new_counts,
        max_2d_size=new_max2d,
        initialized=jnp.ones((), bool),
    )


def _split_dup_masks(params, stats, alive, maxwh, cfg, use_screen_size: bool):
    avg = (
        stats.xys_grad_norm
        / jnp.maximum(stats.vis_counts, 1.0)
        * 0.5
        * maxwh
    )
    high = (avg > cfg.densify_grad_thresh) & alive
    scale_max = jnp.exp(params.scales).max(axis=-1)
    splits = scale_max > cfg.densify_size_thresh
    if use_screen_size:
        splits = splits | (stats.max_2d_size > cfg.split_screen_size)
    splits = splits & high
    # dup test runs on post-shrink scales (model.cpp:374-378)
    scale_max_after = jnp.where(splits, scale_max / cfg.split_size_fac, scale_max)
    dups = (scale_max_after <= cfg.densify_size_thresh) & high
    return splits, dups


@partial(jax.jit, static_argnames=("use_screen_size", "cfg"))
def count_refine_needs(state: TrainState, maxwh, cfg, use_screen_size: bool):
    """(n_alive, n_free, n_needed) so the host can grow capacity first."""
    splits, dups = _split_dup_masks(
        state.params, state.stats, state.alive, maxwh, cfg, use_screen_size
    )
    n_alive = jnp.sum(state.alive)
    c = state.alive.shape[0]
    needed = cfg.n_split_samples * jnp.sum(splits) + jnp.sum(dups)
    return n_alive, c - n_alive, needed


def _scatter_rows(arr: jax.Array, dst: jax.Array, values: jax.Array) -> jax.Array:
    """arr[dst] = values rowwise; rows with dst == C (sentinel) are dropped."""
    return arr.at[dst].set(values, mode="drop")


def _place_candidates(params, opt_mu, opt_nu, alive, dst, cand):
    """Write candidate Gaussians into free slots dst, zeroing Adam moments."""
    new_params = GaussianParams(
        means=_scatter_rows(params.means, dst, cand.means),
        scales=_scatter_rows(params.scales, dst, cand.scales),
        quats=_scatter_rows(params.quats, dst, cand.quats),
        features_dc=_scatter_rows(params.features_dc, dst, cand.features_dc),
        features_rest=_scatter_rows(params.features_rest, dst, cand.features_rest),
        opacities=_scatter_rows(params.opacities, dst, cand.opacities),
    )
    zero = jax.tree.map(jnp.zeros_like, cand)
    new_mu = jax.tree.map(lambda m, z: _scatter_rows(m, dst, z), opt_mu, zero)
    new_nu = jax.tree.map(lambda v, z: _scatter_rows(v, dst, z), opt_nu, zero)
    new_alive = alive.at[dst].set(True, mode="drop")
    return new_params, new_mu, new_nu, new_alive


@partial(
    jax.jit,
    static_argnames=("cfg", "use_screen_size", "do_densification", "do_cull_huge", "do_reset"),
)
def refine_step(
    state: TrainState,
    step: jax.Array,
    maxwh,
    cfg,
    use_screen_size: bool,
    do_densification: bool,
    do_cull_huge: bool,
    do_reset: bool,
) -> Tuple[TrainState, dict]:
    """One refine operation (the body of model.cpp:339-494).

    Host-known booleans (pure functions of the step and config) select the
    compiled variant:
      do_densification = step < stop_split_at and
                         step % reset_interval > num_cameras + refine_every
      do_cull_huge     = step > refine_every * reset_alpha_every
      do_reset         = step < stop_split_at and
                         step % reset_interval == refine_every
      use_screen_size  = step < stop_screen_size_at
    """
    params = state.params
    alive = state.alive
    opt = state.opt
    key = jax.random.fold_in(state.key, step)
    c = alive.shape[0]
    metrics = {}

    if do_densification:
        splits, dups = _split_dup_masks(params, state.stats, alive, maxwh, cfg, use_screen_size)
        n_splits = jnp.sum(splits)
        n_dups = jnp.sum(dups)

        # children sampled with PRE-shrink scales (model.cpp:360-365)
        old_scales_exp = jnp.exp(params.scales)
        qn = params.quats / jnp.linalg.norm(params.quats, axis=-1, keepdims=True)
        rots = quat_to_rotmat(qn)  # (C, 3, 3)
        k0, k1 = jax.random.split(key)
        shrunk_log = params.scales - jnp.log(cfg.split_size_fac)

        def make_split_children(k):
            eps = jax.random.normal(k, (c, 3), jnp.float32)
            offsets = jnp.einsum("cij,cj->ci", rots, old_scales_exp * eps)
            return GaussianParams(
                means=params.means + offsets,
                scales=shrunk_log,
                quats=params.quats,
                features_dc=params.features_dc,
                features_rest=params.features_rest,
                opacities=params.opacities,
            )

        child0 = make_split_children(k0)
        child1 = make_split_children(k1)

        # shrink split parents (model.cpp:374)
        params = params.replace(
            scales=jnp.where(splits[:, None], shrunk_log, params.scales)
        )
        # dup candidates copy post-shrink values (model.cpp:380-385)
        dup_cand = params

        # slot allocation: dead slots in index order; sentinel C = dropped
        free_idx = jnp.nonzero(~alive, size=c, fill_value=c)[0]
        split_rank = jnp.cumsum(splits) - 1
        dup_rank = jnp.cumsum(dups) - 1

        def take_free(i):
            return jnp.take(free_idx, i, mode="fill", fill_value=c)

        dst0 = jnp.where(splits, take_free(split_rank), c)
        dst1 = jnp.where(splits, take_free(n_splits + split_rank), c)
        dstd = jnp.where(dups, take_free(2 * n_splits + dup_rank), c)

        mu, nu = opt.mu, opt.nu
        params, mu, nu, alive = _place_candidates(params, mu, nu, alive, dst0, child0)
        params, mu, nu, alive = _place_candidates(params, mu, nu, alive, dst1, child1)
        params, mu, nu, alive = _place_candidates(params, mu, nu, alive, dstd, dup_cand)
        opt = opt.replace(mu=mu, nu=nu)

        # dropped candidates (capacity overflow — host should prevent this)
        placed = (
            jnp.sum((dst0 < c) & splits)
            + jnp.sum((dst1 < c) & splits)
            + jnp.sum((dstd < c) & dups)
        )
        metrics["added"] = placed
        metrics["dropped"] = cfg.n_split_samples * n_splits + n_dups - placed

        # ---- cull (model.cpp:425-462): applies to old AND new Gaussians
        culls = (jax.nn.sigmoid(params.opacities[:, 0]) < cfg.cull_alpha_thresh) & alive
        culls = culls | splits  # split parents are replaced by their children
        if do_cull_huge:
            huge = jnp.exp(params.scales).max(axis=-1) > cfg.cull_scale_thresh
            if use_screen_size:
                # new slots have max_2d_size == 0 (cleared stats), matching
                # the reference's zero-extension (model.cpp:394-398)
                huge = huge | (state.stats.max_2d_size > cfg.cull_screen_size)
            culls = culls | (huge & alive)
        alive = alive & ~culls
        metrics["culled"] = jnp.sum(culls)
        metrics["n_splits"] = n_splits
        metrics["n_dups"] = n_dups

    if do_reset:
        # alpha reset (model.cpp:464-479)
        reset_logit = jnp.log(
            jnp.asarray(cfg.cull_alpha_thresh * 2.0)
            / (1.0 - cfg.cull_alpha_thresh * 2.0)
        )
        params = params.replace(opacities=jnp.minimum(params.opacities, reset_logit))
        opt = opt.replace(
            mu=opt.mu.replace(opacities=jnp.zeros_like(opt.mu.opacities)),
            nu=opt.nu.replace(opacities=jnp.zeros_like(opt.nu.opacities)),
        )

    metrics["n_alive"] = jnp.sum(alive)
    return (
        TrainState(
            params=params,
            alive=alive,
            opt=opt,
            stats=zero_stats(c),  # model.cpp:482-484
            key=state.key,
        ),
        metrics,
    )
