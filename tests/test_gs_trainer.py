"""GSTrainer: the production trainer on Gaussian-sharded state (CLI
--model-parallel). End-to-end parity with the replicated Trainer across
refine events, band padding for non-tile-aligned heights, and the
visible-subset budget's never-silent overflow handling."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opensplat_tpu.config import TrainConfig
from opensplat_tpu.models.gaussians import init_model
from opensplat_tpu.models.splat_model import DEFAULT_BACKGROUND, render_forward
from opensplat_tpu.parallel.gaussian_shard import (
    GSTrainer,
    band_height,
    gs_render,
    shard_state,
)
from opensplat_tpu.parallel.mesh import make_mesh
from opensplat_tpu.train import Trainer

from test_parallel import _scene
from test_train_synthetic import (
    _ground_truth_state,
    _make_cameras,
    _render_targets,
)


def _training_setup(h=32, w=32):
    cams = _make_cameras(n_cams=8, H=h, W=w, f=40.0)
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
    return cams, pts, rgb, cfg


def _fresh_state(pts, rgb):
    return init_model(pts, rgb, sh_degree=1, capacity=64,
                      capacity_round=64, seed=3)


def test_gs_trainer_parity_with_refine():
    """A 2-shard GSTrainer run equals the replicated Trainer step-for-step
    across refine events: same camera sampling, same refine masks (alive
    set), fp-tolerance-equal parameters — the banded all-gather/
    reduce-scatter pipeline is semantically invisible."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    cams, pts, rgb, cfg = _training_setup()

    ref = Trainer(_fresh_state(pts, rgb), cams, cfg, renderer="tiled")
    gst = GSTrainer(_fresh_state(pts, rgb), cams, cfg, renderer="tiled",
                    n_model=2)

    refine_seen = False
    for step in range(1, 23):
        mr = ref.run_step(step)
        mg = gst.run_step(step)
        np.testing.assert_allclose(mg.loss, mr.loss, rtol=5e-4)
        if step % cfg.refine_every == 0 and step > cfg.warmup_length:
            refine_seen = True
            np.testing.assert_array_equal(
                np.asarray(gst.state.alive), np.asarray(ref.state.alive)
            )
            assert gst.refine_metrics == ref.refine_metrics
    assert refine_seen
    assert gst.v_overflow_events == 0  # post-refine V growth pre-empted it
    for name in ("means", "scales", "quats", "features_dc", "opacities"):
        np.testing.assert_allclose(
            np.asarray(getattr(gst.state.params, name)),
            np.asarray(getattr(ref.state.params, name)),
            rtol=5e-3, atol=5e-5, err_msg=name,
        )
    assert mg.loss < 0.2  # training made progress


def test_gs_render_pad_height():
    """Non-tile-aligned image heights render through padded bands: the
    cropped result equals the replicated render bit-for-fp (tiles are
    independent, so pad rows cannot affect real rows)."""
    m = 4
    if len(jax.devices()) < m:
        pytest.skip("needs devices")
    h, w = 40, 64  # 40 % (16*4) != 0 -> band_h 16, canvas 64, crop to 40
    assert band_height(h, m) * m > h
    state, cams, _ = _scene(1)
    mesh = make_mesh(n_data=1, n_model=m, devices=jax.devices()[:m])
    sh_state = shard_state(mesh, state)

    ref = render_forward(
        state.params, state.alive, jnp.asarray(cams[0]), 40.0, 40.0,
        w / 2.0, h / 2.0, h, w, 1,
        jnp.asarray(DEFAULT_BACKGROUND, jnp.float32), renderer="tiled",
    )
    rgb, n_vis, _ = gs_render(
        sh_state, jnp.asarray(cams[0]), 40.0, 40.0, w / 2.0, h / 2.0,
        mesh, h, w, 1, v_budget=state.alive.shape[0] // m,
        renderer="tiled",
    )
    assert rgb.shape == (h, w, 3)
    np.testing.assert_allclose(
        np.asarray(rgb), np.asarray(ref.rgb), rtol=1e-5, atol=1e-5
    )


def test_gs_v_budget_overflow_logged_and_regrown(capsys):
    """An undersized visible-subset budget truncates the render — the
    trainer must LOG the overflow with its drop count and regrow the
    budget at the next sync point (SURVEY.md §7 hard-part 3)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    cams, pts, rgb, cfg = _training_setup()
    gst = GSTrainer(_fresh_state(pts, rgb), cams, cfg, renderer="dense",
                    n_model=2)
    gst._v_budget = 1  # force truncation
    gst.run_step(1)  # step 1 is a sync point
    out = capsys.readouterr().out
    assert "visible-subset budget overflow" in out
    assert "truncated" in out
    assert gst.v_overflow_events == 1
    assert gst._v_budget > 1  # regrown
    # and the regrown budget stops truncating
    gst.run_step(2)
    assert gst.v_overflow_events == 1


@pytest.mark.parametrize("renderer", ["tiled", "pallas"])
def test_hybrid_trainer_parity_with_refine(renderer):
    """Hybrid GSTrainer (2-camera DP x 2-shard MP on 4 devices) equals
    the replicated DPTrainer with the same 2-camera batches step-for-step
    across a refine event: same sampler order, same refine masks,
    fp-tolerance-equal parameters — both scaling axes composed without
    changing the training semantics. The pallas leg pins the 2D-mesh
    shard_map around the opaque Pallas custom calls THROUGH a refine
    event (the shape-changing case) in interpret mode on the CPU mesh."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from opensplat_tpu.parallel.dp_trainer import DPTrainer
    from opensplat_tpu.parallel.mesh import make_mesh as _mk

    cams, pts, rgb, cfg = _training_setup()

    dp_mesh = _mk(n_data=2, n_model=1, devices=jax.devices()[:2])
    ref = DPTrainer(_fresh_state(pts, rgb), cams, cfg, renderer=renderer,
                    mesh=dp_mesh, d_local=1)
    hyb = GSTrainer(_fresh_state(pts, rgb), cams, cfg, renderer=renderer,
                    n_model=2, n_data=2)
    assert hyb.d_total == ref.d_total == 2

    refine_seen = False
    for step in range(1, 16):
        mr = ref.run_step(step)
        mh = hyb.run_step(step)
        np.testing.assert_allclose(mh.loss, mr.loss, rtol=5e-4)
        if step % cfg.refine_every == 0 and step > cfg.warmup_length:
            refine_seen = True
            np.testing.assert_array_equal(
                np.asarray(hyb.state.alive), np.asarray(ref.state.alive)
            )
            assert hyb.refine_metrics == ref.refine_metrics
    assert refine_seen
    for name in ("means", "scales", "quats", "features_dc", "opacities"):
        np.testing.assert_allclose(
            np.asarray(getattr(hyb.state.params, name)),
            np.asarray(getattr(ref.state.params, name)),
            rtol=5e-3, atol=5e-5, err_msg=name,
        )
