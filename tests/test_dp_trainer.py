"""Camera-DP training on the virtual device mesh — the usable multi-chip
path (VERDICT round-1 item 1): `dp_train_step` (shard_map, one parameter
gradient psum per step) must match the unsharded batched step on every
renderer, and the DPTrainer must reproduce the single-device batched
trainer end-to-end INCLUDING refine/densify events on sharded state.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from opensplat_tpu.config import TrainConfig
from opensplat_tpu.models.gaussians import GaussianParams, init_model
from opensplat_tpu.models.splat_model import DEFAULT_BACKGROUND, render_forward
from opensplat_tpu.optim.adam import adam_update, means_lr_schedule
from opensplat_tpu.ops.ssim import main_loss
from opensplat_tpu.parallel.dp_trainer import DPTrainer, dp_train_step
from opensplat_tpu.parallel.mesh import make_mesh
from opensplat_tpu.parallel.sharded_train import batched_train_step

from test_parallel import _batched_args, _scene, CFG, LR, H, W
from test_train_synthetic import (
    _ground_truth_state,
    _make_cameras,
    _render_targets,
)


def _dp_args(state, cams, gts, d, mesh):
    cam_sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    args = _batched_args(cams, gts, d)
    return (
        jax.device_put(state, rep),
        {k: jax.device_put(v, cam_sh) for k, v in args.items()},
        jax.device_put(jnp.zeros((3,), jnp.int32), rep),
    )


def _assert_state_close(a, b, rtol=2e-4, atol=1e-5):
    for name in ("means", "scales", "quats", "features_dc",
                 "features_rest", "opacities"):
        np.testing.assert_allclose(
            np.asarray(getattr(a.params, name)),
            np.asarray(getattr(b.params, name)),
            rtol=rtol, atol=atol, err_msg=name,
        )


def test_dp_step_matches_batched_dense():
    """4-device shard_map DP step == unsharded batched step (dense):
    params, densify stats, and metrics all agree."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    d = 4
    state, cams, gts = _scene(d)
    args = _batched_args(cams, gts, d)
    ref_state, ref_m = batched_train_step(
        state, **args, means_lr=LR, height=H, width=W, sh_deg=1,
        cfg=CFG, accumulate=True, renderer="dense",
    )

    mesh = make_mesh(n_data=d, n_model=1, devices=jax.devices()[:d])
    sh_state, sh_args, pend = _dp_args(state, cams, gts, d, mesh)
    new_state, m = dp_train_step(
        sh_state, sh_args["cam_to_world"], sh_args["fx"], sh_args["fy"],
        sh_args["cx"], sh_args["cy"], sh_args["gt_images"], LR, pend,
        mesh, H, W, 1, CFG, True, "dense",
    )
    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m["psnr"]), float(ref_m["psnr"]), rtol=1e-5)
    assert int(m["n_visible"]) == int(ref_m["n_visible"])
    _assert_state_close(new_state, ref_state)
    np.testing.assert_allclose(
        np.asarray(new_state.stats.xys_grad_norm),
        np.asarray(ref_state.stats.xys_grad_norm),
        rtol=2e-4, atol=1e-8,
    )
    np.testing.assert_array_equal(
        np.asarray(new_state.stats.vis_counts),
        np.asarray(ref_state.stats.vis_counts),
    )


@pytest.mark.parametrize("renderer", ["tiled", "pallas"])
def test_dp_step_production_renderer(renderer):
    """The PRODUCTION renderers under shard_map: a 2-device DP step
    matches an explicitly-written 2-camera mean-loss reference step
    (no vmap — two render_forward calls), exercising the Pallas kernel
    (interpret mode on CPU) per device."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    d = 2
    state, cams, gts = _scene(d)
    args = _batched_args(cams, gts, d)
    capacity = state.alive.shape[0]

    # explicit unsharded reference: mean loss over both cameras
    def loss_fn(params, shifts):
        losses = []
        radii = []
        for i in range(d):
            out = render_forward(
                params, state.alive, args["cam_to_world"][i],
                args["fx"][i], args["fy"][i], args["cx"][i], args["cy"][i],
                H, W, 1, jnp.asarray(DEFAULT_BACKGROUND, jnp.float32),
                xys_shift=shifts[i], renderer=renderer,
            )
            losses.append(main_loss(out.rgb, args["gt_images"][i],
                                    CFG.ssim_weight))
            radii.append(out.radii)
        return (losses[0] + losses[1]) / d, jnp.stack(radii)

    (ref_loss, _), (g_params, _) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(state.params, jnp.zeros((d, capacity, 2), jnp.float32))
    lrs = GaussianParams(
        means=LR, scales=CFG.lr_scales, quats=CFG.lr_quats,
        features_dc=CFG.lr_features_dc, features_rest=CFG.lr_features_rest,
        opacities=CFG.lr_opacities,
    )
    ref_params, _ = adam_update(
        state.params, g_params, state.opt, lrs, state.alive
    )

    mesh = make_mesh(n_data=d, n_model=1, devices=jax.devices()[:d])
    sh_state, sh_args, pend = _dp_args(state, cams, gts, d, mesh)
    new_state, m = dp_train_step(
        sh_state, sh_args["cam_to_world"], sh_args["fx"], sh_args["fy"],
        sh_args["cx"], sh_args["cy"], sh_args["gt_images"], LR, pend,
        mesh, H, W, 1, CFG, True, renderer,
    )
    np.testing.assert_allclose(float(m["loss"]), float(ref_loss), rtol=1e-5)
    for name in ("means", "scales", "quats", "features_dc", "opacities"):
        np.testing.assert_allclose(
            np.asarray(getattr(new_state.params, name)),
            np.asarray(getattr(ref_params, name)),
            rtol=2e-4, atol=5e-6, err_msg=name,
        )
    assert int(np.asarray(m["demand"])[1]) > 0  # budget feedback flows


def test_dp_trainer_parity_with_refine():
    """DPTrainer end-to-end: a 4-device camera-DP run equals a 1-device
    run of the same batched semantics (d_local=4) step-for-step across
    a refine event — identical camera sampling, identical refine masks
    (alive set), fp-tolerance-equal parameters."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    cams = _make_cameras(n_cams=8, H=32, W=32, f=40.0)
    gt_state = _ground_truth_state(n=40, capacity=64)
    targets = _render_targets(gt_state, cams)
    for cam, img in zip(cams, targets):
        cam.set_image(img)

    rng = np.random.default_rng(9)
    pts = np.asarray(gt_state.params.means)[np.asarray(gt_state.alive)]
    pts = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    rgb = rng.integers(0, 255, (pts.shape[0], 3)).astype(np.uint8)
    cfg = TrainConfig(
        num_iters=60, sh_degree=1, num_downscales=0,
        warmup_length=4, refine_every=10, capacity_round=64,
    )

    def make(n_devices, d_local):
        state = init_model(pts, rgb, sh_degree=1, capacity=64,
                           capacity_round=64, seed=3)
        mesh = make_mesh(n_data=n_devices, n_model=1,
                         devices=jax.devices()[:n_devices])
        return DPTrainer(state, cams, cfg, renderer="tiled", mesh=mesh,
                         d_local=d_local)

    dp4 = make(4, 1)
    dp1 = make(1, 4)
    assert dp4.d_total == dp1.d_total == 4

    refine_seen = False
    for step in range(1, 23):
        m4 = dp4.run_step(step)
        m1 = dp1.run_step(step)
        np.testing.assert_allclose(m4.loss, m1.loss, rtol=5e-4)
        if step % cfg.refine_every == 0 and step > cfg.warmup_length:
            refine_seen = True
            # identical refine decisions (split/dup/cull masks)
            np.testing.assert_array_equal(
                np.asarray(dp4.state.alive), np.asarray(dp1.state.alive)
            )
            assert dp4.refine_metrics == dp1.refine_metrics
    assert refine_seen
    _assert_state_close(dp4.state, dp1.state, rtol=5e-3, atol=5e-5)
    # training made progress
    assert m4.loss < 0.2


def test_dp_stats_match_sequential_reference_steps():
    """VERDICT round-1 item 8: a D-camera DP batch's densify-stat
    accumulation must equal D SEQUENTIAL single-camera reference steps
    (model.cpp:317-337) — not merely a single-device batched step.
    Parameters are frozen (lr ~ 0) so the sequential trajectory sees the
    same weights at every camera, isolating the stat semantics: the
    global-mean-loss gradient times D must reproduce each per-camera
    gradient, the batch "first accumulation" must treat global camera 0
    as the reference's first step, and the resulting split/dup masks
    must be identical."""
    d = 4
    if len(jax.devices()) < d:
        pytest.skip("needs 4 devices")
    from opensplat_tpu.models.densify import _split_dup_masks
    from opensplat_tpu.train import Trainer

    cams = _make_cameras(n_cams=d, H=32, W=32, f=40.0)
    gt_state = _ground_truth_state(n=40, capacity=64)
    targets = _render_targets(gt_state, cams)
    for cam, img in zip(cams, targets):
        cam.set_image(img)

    rng = np.random.default_rng(9)
    pts = np.asarray(gt_state.params.means)[np.asarray(gt_state.alive)]
    pts = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    rgb = rng.integers(0, 255, (pts.shape[0], 3)).astype(np.uint8)
    frozen = dict(
        lr_means=1e-30, lr_means_final=1e-30, lr_scales=0.0, lr_quats=0.0,
        lr_features_dc=0.0, lr_features_rest=0.0, lr_opacities=0.0,
    )
    cfg = TrainConfig(
        num_iters=60, sh_degree=1, num_downscales=0,
        warmup_length=50, refine_every=100, capacity_round=64,
        densify_grad_thresh=2e-5,  # low enough that masks are nontrivial
        **frozen,
    )

    def fresh():
        return init_model(pts, rgb, sh_degree=1, capacity=64,
                          capacity_round=64, seed=3)

    seq = Trainer(fresh(), cams, cfg, renderer="tiled")
    for step in range(1, d + 1):
        seq.run_step(step)

    mesh = make_mesh(n_data=d, n_model=1, devices=jax.devices()[:d])
    dp = DPTrainer(fresh(), cams, cfg, renderer="tiled", mesh=mesh,
                   d_local=1)
    dp.run_step(1)  # same sampler seed -> same d cameras, same order

    # frozen params: bitwise-identical weights at every camera
    for name in ("means", "scales", "quats", "opacities"):
        np.testing.assert_array_equal(
            np.asarray(getattr(dp.state.params, name)),
            np.asarray(getattr(seq.state.params, name)), err_msg=name,
        )
    # stat accumulation: psum reorders fp additions -> tight allclose
    for name in ("xys_grad_norm", "vis_counts", "max_2d_size"):
        np.testing.assert_allclose(
            np.asarray(getattr(dp.state.stats, name)),
            np.asarray(getattr(seq.state.stats, name)),
            rtol=1e-5, atol=1e-7, err_msg=name,
        )
    assert bool(dp.state.stats.initialized)

    maxwh = 32.0
    m_seq = _split_dup_masks(seq.state.params, seq.state.stats,
                             seq.state.alive, maxwh, cfg, True)
    m_dp = _split_dup_masks(dp.state.params, dp.state.stats,
                            dp.state.alive, maxwh, cfg, True)
    splits_seq, dups_seq = (np.asarray(m) for m in m_seq)
    splits_dp, dups_dp = (np.asarray(m) for m in m_dp)
    assert int(splits_seq.sum()) + int(dups_seq.sum()) > 0  # nontrivial
    np.testing.assert_array_equal(splits_dp, splits_seq)
    np.testing.assert_array_equal(dups_dp, dups_seq)
