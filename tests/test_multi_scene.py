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


def test_multi_scene_trainer_parity_with_refine():
    """MultiSceneTrainer (2 scenes, one stacked program) advances each
    scene exactly as its standalone Trainer would, step-for-step across
    a refine event: same sampler order, same refine masks, fp-tolerance
    parameters — batching changes the schedule of nothing."""
    from opensplat_tpu.data.dataset import Camera
    from opensplat_tpu.parallel.multi_scene import MultiSceneTrainer
    from opensplat_tpu.train import Trainer

    def look_at(eye):
        eye = np.asarray(eye, np.float64)
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
        return c2w

    def scene(seed, n_cams):
        rng = np.random.default_rng(seed)
        pts = rng.uniform(-1.0, 1.0, (48, 3)).astype(np.float32)
        rgb = rng.integers(0, 255, (48, 3)).astype(np.uint8)
        st = init_model(pts, rgb, sh_degree=1, capacity=CAP,
                        capacity_round=CAP, seed=seed)
        cams = []
        for i in range(n_cams):
            a = 2 * np.pi * i / n_cams
            cam = Camera(width=W, height=H, fx=40.0, fy=40.0,
                         cx=W / 2.0, cy=H / 2.0,
                         cam_to_world=look_at(
                             (5 * np.sin(a), 0.4, 5 * np.cos(a))),
                         file_path=f"s{seed}_c{i}.png")
            cam.set_image(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
            cams.append(cam)
        return st, cams

    cfg = TrainConfig(num_iters=200, refine_every=8, warmup_length=4,
                      reset_alpha_every=3, num_downscales=0,
                      capacity_round=CAP)
    # different camera counts: the reset-interval guard (model.cpp:341)
    # must see each scene's own count
    (st_a, cams_a), (st_b, cams_b) = scene(1, 3), scene(2, 5)

    msc = MultiSceneTrainer([st_a, st_b], [cams_a, cams_b], cfg,
                            renderer="tiled")
    ref_a = Trainer(st_a, cams_a, cfg, renderer="tiled")
    ref_b = Trainer(st_b, cams_b, cfg, renderer="tiled")

    refined = False
    for step in range(1, 18):
        out = msc.run_step(step)
        oa, ob = ref_a.run_step(step), ref_b.run_step(step)
        per = np.asarray(out._metrics["loss_per_scene"])
        np.testing.assert_allclose(per[0], oa.loss, rtol=5e-4)
        np.testing.assert_allclose(per[1], ob.loss, rtol=5e-4)
        if msc.refine_metrics is not None:
            refined = True
    assert refined
    outs = msc.scene_states()
    for got, ref in zip(outs, (ref_a.state, ref_b.state)):
        cap = min(got.alive.shape[0], ref.alive.shape[0])
        np.testing.assert_array_equal(
            np.asarray(got.alive[:cap]), np.asarray(ref.alive[:cap])
        )
        np.testing.assert_allclose(
            np.asarray(got.params.means[:cap]),
            np.asarray(ref.params.means[:cap]),
            rtol=5e-3, atol=5e-5,
        )


def test_multi_scene_trainer_sharded():
    """The sharded MultiSceneTrainer (scene axis over `data`) produces
    the same per-scene losses as the vmapped one."""
    if len(jax.devices()) < 2:
        pytest.skip("needs devices")
    from opensplat_tpu.data.dataset import Camera
    from opensplat_tpu.parallel.multi_scene import MultiSceneTrainer

    rng = np.random.default_rng(0)

    def scene(seed):
        r = np.random.default_rng(seed)
        pts = r.uniform(-1.0, 1.0, (48, 3)).astype(np.float32)
        rgb = r.integers(0, 255, (48, 3)).astype(np.uint8)
        st = init_model(pts, rgb, sh_degree=1, capacity=CAP,
                        capacity_round=CAP, seed=seed)
        c2w = np.eye(4, dtype=np.float32)
        c2w[2, 3] = 4.0
        cam = Camera(width=W, height=H, fx=40.0, fy=40.0, cx=W / 2.0,
                     cy=H / 2.0, cam_to_world=c2w, file_path=f"c{seed}.png")
        cam.set_image(r.uniform(0, 1, (H, W, 3)).astype(np.float32))
        return st, [cam]

    cfg = TrainConfig(num_iters=100, num_downscales=0, capacity_round=CAP)
    scenes = [scene(i) for i in range(2)]
    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])

    a = MultiSceneTrainer([s for s, _ in scenes], [c for _, c in scenes],
                          cfg, renderer="tiled")
    b = MultiSceneTrainer([s for s, _ in scenes], [c for _, c in scenes],
                          cfg, renderer="tiled", mesh=mesh)
    for step in range(1, 4):
        la = np.asarray(a.run_step(step)._metrics["loss_per_scene"])
        lb = np.asarray(b.run_step(step)._metrics["loss_per_scene"])
        np.testing.assert_allclose(la, lb, rtol=1e-5)
