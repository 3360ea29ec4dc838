"""Multi-scene batched training: S independent scenes in one program,
scene axis sharded over the data mesh axis."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from opensplat_tpu.config import TrainConfig
from opensplat_tpu.models.gaussians import init_model
from opensplat_tpu.optim.adam import means_lr_schedule
from opensplat_tpu.parallel.mesh import make_mesh
from opensplat_tpu.parallel.multi_scene import (
    multi_scene_train_step,
    stack_states,
    unstack_states,
)
from opensplat_tpu.train import train_step

H = W = 32
CAP = 128
CFG = TrainConfig(num_iters=100, capacity_round=CAP)
LR = means_lr_schedule(CFG.lr_means, CFG.lr_means_final, CFG.num_iters, 0)


def _scenes(s):
    states, cams, gts = [], [], []
    for i in range(s):
        rng = np.random.default_rng(100 + i)
        pts = rng.uniform(-1.0, 1.0, (64, 3)).astype(np.float32)
        rgb = rng.integers(0, 255, (64, 3)).astype(np.uint8)
        states.append(init_model(pts, rgb, sh_degree=1, capacity=CAP, seed=i))
        c2w = np.eye(4, dtype=np.float32)
        c2w[2, 3] = 4.0 + 0.2 * i
        cams.append(c2w)
        gts.append(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    return states, np.stack(cams), np.stack(gts)


def test_multi_scene_matches_independent_steps():
    s = 4
    states, cams, gts = _scenes(s)
    stacked = stack_states(states)
    new_stacked, metrics = multi_scene_train_step(
        stacked, jnp.asarray(cams),
        jnp.full((s,), 40.0), jnp.full((s,), 40.0),
        jnp.full((s,), W / 2.0), jnp.full((s,), H / 2.0),
        jnp.asarray(gts), LR, H, W, 1, CFG, True, "dense",
    )
    assert metrics["loss"].shape == (s,)
    outs = unstack_states(new_stacked, s)
    for i in range(s):
        ref, m = train_step(
            states[i], jnp.asarray(cams[i]), 40.0, 40.0, W / 2.0, H / 2.0,
            jnp.asarray(gts[i]), LR, H, W, 1, CFG, True, "dense",
        )
        np.testing.assert_allclose(
            float(metrics["loss"][i]), float(m["loss"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(outs[i].params.means),
            np.asarray(ref.params.means),
            rtol=2e-4, atol=5e-6,
        )


def test_multi_scene_sharded_over_data_axis():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    s = 8
    states, cams, gts = _scenes(s)
    stacked = stack_states(states)
    mesh = make_mesh(n_data=8, n_model=1, devices=jax.devices()[:8])
    scene_sh = NamedSharding(mesh, P("data"))

    def shard(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == s:
            return jax.device_put(
                x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
            )
        return x

    stacked = jax.tree.map(shard, stacked)
    with mesh:
        new_stacked, metrics = multi_scene_train_step(
            stacked,
            jax.device_put(jnp.asarray(cams), scene_sh),
            jax.device_put(jnp.full((s,), 40.0), scene_sh),
            jax.device_put(jnp.full((s,), 40.0), scene_sh),
            jax.device_put(jnp.full((s,), W / 2.0), scene_sh),
            jax.device_put(jnp.full((s,), H / 2.0), scene_sh),
            jax.device_put(jnp.asarray(gts), scene_sh),
            LR, H, W, 1, CFG, True, "dense",
        )
    assert bool(jnp.all(jnp.isfinite(metrics["loss"])))
    # scene axis stays sharded over data
    assert new_stacked.params.means.sharding.spec[0] == "data"


@pytest.mark.parametrize("renderer", ["tiled", "pallas"])
def test_multi_scene_production_renderers(renderer):
    """The vmapped scene batch supports the production renderers too
    (jax's pallas_call vmap batching rule maps the scene axis onto the
    kernel grid): per-scene losses match the unbatched train_step."""
    s = 2
    states, cams, gts = _scenes(s)
    stacked = stack_states(states)
    new_stacked, metrics = multi_scene_train_step(
        stacked, jnp.asarray(cams),
        jnp.full((s,), 40.0), jnp.full((s,), 40.0),
        jnp.full((s,), W / 2.0), jnp.full((s,), H / 2.0),
        jnp.asarray(gts), LR, H, W, 1, CFG, True, renderer,
    )
    for i in range(s):
        _, m_ref = train_step(
            states[i], jnp.asarray(cams[i]), 40.0, 40.0, W / 2.0, H / 2.0,
            jnp.asarray(gts[i]), LR, H, W, 1, CFG, True, renderer,
        )
        np.testing.assert_allclose(
            float(metrics["loss"][i]), float(m_ref["loss"]), rtol=2e-5
        )


@pytest.mark.parametrize("renderer", ["tiled", "pallas"])
def test_sharded_multi_scene_matches_vmap(renderer):
    """shard_map'd multi-scene (scene axis over `data`, per-device local
    pipelines — the layout that actually scales Pallas scenes across a
    real mesh) matches the plain vmapped batch."""
    from opensplat_tpu.parallel.multi_scene import sharded_multi_scene_step

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    s = 2
    states, cams, gts = _scenes(s)
    stacked = stack_states(states)
    args = (
        jnp.asarray(cams), jnp.full((s,), 40.0), jnp.full((s,), 40.0),
        jnp.full((s,), W / 2.0), jnp.full((s,), H / 2.0), jnp.asarray(gts),
    )
    ref_stacked, ref_m = multi_scene_train_step(
        stacked, *args, LR, H, W, 1, CFG, True, renderer,
    )
    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    sh_stacked, sh_m = sharded_multi_scene_step(
        stacked, *args, LR, mesh, H, W, 1, CFG, True, renderer,
    )
    np.testing.assert_allclose(
        np.asarray(sh_m["loss"]), np.asarray(ref_m["loss"]), rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(sh_stacked.params.means),
        np.asarray(ref_stacked.params.means), rtol=2e-4, atol=1e-6,
    )
