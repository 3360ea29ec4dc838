"""Unit tests for the fixed-capacity densify/cull/reset state machine
against the reference semantics (model.cpp:311-494)."""
import numpy as np
import jax
import jax.numpy as jnp

from opensplat_tpu.config import TrainConfig
from opensplat_tpu.models.gaussians import (
    GaussianParams, DensifyStats, TrainState, init_model, grow_capacity, zero_stats,
)
from opensplat_tpu.models.densify import (
    accumulate_stats, count_refine_needs, refine_step,
)
from opensplat_tpu.optim.adam import adam_init

CFG = TrainConfig(num_iters=1000, capacity_round=64)


def _state_with(n=4, capacity=16, scales=None, opacities=None):
    pts = np.linspace(-1, 1, n * 3).reshape(n, 3).astype(np.float32)
    rgb = np.full((n, 3), 128, np.uint8)
    state = init_model(pts, rgb, sh_degree=1, capacity=capacity, seed=0)
    p = state.params
    if scales is not None:
        p = p.replace(scales=p.scales.at[:n].set(np.log(scales)))
    if opacities is not None:
        p = p.replace(opacities=p.opacities.at[:n, 0].set(opacities))
    return state.replace(params=p)


def _high_grad_stats(state, idx, maxwh=100.0):
    c = state.alive.shape[0]
    norm = np.zeros(c, np.float32)
    counts = np.ones(c, np.float32)
    # avg * 0.5 * maxwh > 2e-4  => norm > 4e-6 * ... pick comfortably high
    norm[idx] = 1.0
    return DensifyStats(
        xys_grad_norm=jnp.asarray(norm),
        vis_counts=jnp.asarray(counts),
        max_2d_size=jnp.zeros(c),
        initialized=jnp.ones((), bool),
    )


def test_accumulate_stats_init_and_update():
    state = _state_with(n=3, capacity=8)
    g = np.zeros((8, 2), np.float32)
    g[0] = [3.0, 4.0]
    radii = np.zeros(8, np.int32)
    radii[0] = 10
    s1 = accumulate_stats(state.stats, jnp.asarray(g), jnp.asarray(radii), 100, 50)
    # init: every slot gets vis_count 1 and the raw grad norm (model.cpp:321-323)
    assert float(s1.vis_counts[1]) == 1.0
    np.testing.assert_allclose(float(s1.xys_grad_norm[0]), 5.0)
    np.testing.assert_allclose(float(s1.max_2d_size[0]), 0.1)
    # second step: only visible entries update
    s2 = accumulate_stats(s1, jnp.asarray(g), jnp.asarray(radii), 100, 50)
    np.testing.assert_allclose(float(s2.xys_grad_norm[0]), 10.0)
    assert float(s2.vis_counts[0]) == 2.0
    assert float(s2.vis_counts[1]) == 1.0
    assert float(s2.xys_grad_norm[1]) == 0.0


def test_split_replaces_parent_with_two_children():
    # gaussian 0: large scale (0.05 > 0.01 thresh) + high grad -> split
    state = _state_with(n=2, capacity=16, scales=np.array([[0.05] * 3, [0.001] * 3]))
    state = state.replace(stats=_high_grad_stats(state, [0]))
    new, m = refine_step(
        state, jnp.asarray(600), 100.0, CFG,
        use_screen_size=True, do_densification=True, do_cull_huge=False, do_reset=False,
    )
    assert int(m["n_splits"]) == 1 and int(m["n_dups"]) == 0
    assert int(m["dropped"]) == 0
    alive = np.asarray(new.alive)
    # parent (slot 0) culled, gaussian 1 kept, 2 children in free slots
    assert not alive[0] and alive[1]
    assert alive.sum() == 3
    children = np.where(alive)[0][1:]
    child_scales = np.exp(np.asarray(new.params.scales)[children])
    np.testing.assert_allclose(child_scales, 0.05 / 1.6, rtol=1e-5)
    # children inherit parent's other attrs; means offset by sampled noise
    parent_mean = np.asarray(state.params.means)[0]
    for ch in children:
        d = np.linalg.norm(np.asarray(new.params.means)[ch] - parent_mean)
        assert 0 < d < 0.5  # N(0, 0.05) rotated
        # zeroed Adam moments for the new slots
        assert np.all(np.asarray(new.opt.mu.means)[ch] == 0)


def test_dup_keeps_original():
    state = _state_with(n=2, capacity=16, scales=np.array([[0.005] * 3, [0.001] * 3]))
    state = state.replace(stats=_high_grad_stats(state, [0]))
    new, m = refine_step(
        state, jnp.asarray(600), 100.0, CFG,
        use_screen_size=True, do_densification=True, do_cull_huge=False, do_reset=False,
    )
    assert int(m["n_splits"]) == 0 and int(m["n_dups"]) == 1
    alive = np.asarray(new.alive)
    assert alive[0] and alive[1] and alive.sum() == 3
    dup_slot = np.where(alive)[0][2]
    np.testing.assert_allclose(
        np.asarray(new.params.means)[dup_slot], np.asarray(state.params.means)[0]
    )


def test_low_opacity_culled():
    # logit(0.05) < logit(0.1) -> culled
    state = _state_with(n=3, capacity=8, opacities=np.array([-3.0, 2.0, 2.0]))
    state = state.replace(stats=_high_grad_stats(state, []))
    new, m = refine_step(
        state, jnp.asarray(600), 100.0, CFG,
        use_screen_size=True, do_densification=True, do_cull_huge=False, do_reset=False,
    )
    alive = np.asarray(new.alive)
    assert not alive[0] and alive[1] and alive[2]
    assert int(m["culled"]) == 1


def test_huge_scale_culled_when_enabled():
    state = _state_with(n=2, capacity=8, scales=np.array([[0.6] * 3, [0.001] * 3]))
    state = state.replace(stats=_high_grad_stats(state, []))
    new, _ = refine_step(
        state, jnp.asarray(3100), 100.0, CFG,
        use_screen_size=True, do_densification=True, do_cull_huge=True, do_reset=False,
    )
    alive = np.asarray(new.alive)
    assert not alive[0] and alive[1]


def test_alpha_reset_clamps_and_zeroes_moments():
    state = _state_with(n=2, capacity=8, opacities=np.array([3.0, -4.0]))
    # dirty moments
    mu = state.opt.mu.replace(opacities=jnp.ones_like(state.opt.mu.opacities))
    state = state.replace(opt=state.opt.replace(mu=mu))
    new, _ = refine_step(
        state, jnp.asarray(100), 100.0, CFG,
        use_screen_size=True, do_densification=False, do_cull_huge=False, do_reset=True,
    )
    logit02 = float(np.log(0.2 / 0.8))
    op = np.asarray(new.params.opacities)[:, 0]
    np.testing.assert_allclose(op[0], logit02, rtol=1e-5)
    np.testing.assert_allclose(op[1], -4.0)  # already below the clamp
    assert np.all(np.asarray(new.opt.mu.opacities) == 0)


def test_stats_cleared_after_refine():
    state = _state_with(n=2, capacity=8)
    state = state.replace(stats=_high_grad_stats(state, [0]))
    new, _ = refine_step(
        state, jnp.asarray(600), 100.0, CFG,
        use_screen_size=True, do_densification=True, do_cull_huge=False, do_reset=False,
    )
    assert not bool(new.stats.initialized)
    assert np.all(np.asarray(new.stats.xys_grad_norm) == 0)


def test_count_and_grow_capacity():
    state = _state_with(n=4, capacity=8, scales=np.full((4, 3), 0.05))
    state = state.replace(stats=_high_grad_stats(state, [0, 1, 2, 3]))
    n_alive, n_free, needed = count_refine_needs(state, 100.0, CFG, True)
    assert int(n_alive) == 4 and int(n_free) == 4 and int(needed) == 8
    grown = grow_capacity(state, 32)
    assert grown.alive.shape[0] == 32
    assert int(jnp.sum(grown.alive)) == 4
    new, m = refine_step(
        grown, jnp.asarray(600), 100.0, CFG,
        use_screen_size=True, do_densification=True, do_cull_huge=False, do_reset=False,
    )
    assert int(m["dropped"]) == 0
    assert int(m["added"]) == 8
    # 4 parents culled, 8 children alive
    assert int(jnp.sum(new.alive)) == 8
