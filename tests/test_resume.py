"""Crash recovery (VERDICT round-2 item 5; SURVEY.md §5 elastic
recovery): a training run killed mid-flight and resumed from the newest
native checkpoint must continue the uninterrupted run's trajectory —
same camera order (sampler fast-forward), same refine decisions, same
parameters — not merely "keep training". Covers the Trainer-level exact
path and the CLI --checkpoint-every/--auto-resume wiring
(reference anchor: opensplat.cpp:147-149 resume + model.cpp:629-778 load).
"""
import os

import numpy as np
import pytest

from opensplat_tpu.config import TrainConfig
from opensplat_tpu.io.scene_io import load_checkpoint, save_checkpoint
from opensplat_tpu.models.gaussians import init_model
from opensplat_tpu.train import InfiniteRandomSampler, Trainer

from test_train_synthetic import (
    _ground_truth_state,
    _make_cameras,
    _render_targets,
)


def _setup(h=32, w=32, n_cams=6):
    cams = _make_cameras(n_cams=n_cams, H=h, W=w, f=40.0)
    gt_state = _ground_truth_state(n=40, capacity=64)
    targets = _render_targets(gt_state, cams)
    for cam, img in zip(cams, targets):
        cam.set_image(img)
    rng = np.random.default_rng(11)
    pts = np.asarray(gt_state.params.means)[np.asarray(gt_state.alive)]
    pts = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    rgb = rng.integers(0, 255, (pts.shape[0], 3)).astype(np.uint8)
    cfg = TrainConfig(
        num_iters=24, sh_degree=1, num_downscales=0,
        warmup_length=4, refine_every=10, capacity_round=64,
    )
    return cams, pts, rgb, cfg


def _fresh(pts, rgb):
    return init_model(pts, rgb, sh_degree=1, capacity=64,
                      capacity_round=64, seed=3)


def test_sampler_fast_forward_replays_order():
    """fast_forward(n) == n next() calls, across epoch reshuffles."""
    a = InfiniteRandomSampler(5, seed=9)
    for _ in range(13):  # 13 draws crosses two epoch reshuffles of 5
        a.next()
    b = InfiniteRandomSampler(5, seed=9)
    b.fast_forward(13)
    assert b.draws == 13
    assert [a.next() for _ in range(7)] == [b.next() for _ in range(7)]


def test_trainer_resume_exact_across_refine(tmp_path):
    """Kill-and-resume == uninterrupted run, bit-level: train 24 steps in
    one go (crossing two refine events); separately train 12 steps,
    checkpoint (with sampler position), DROP the trainer, restore from
    the checkpoint, fast-forward the sampler, train 13..24. Final alive
    masks identical, parameters equal, refine decisions identical."""
    cams, pts, rgb, cfg = _setup()

    # uninterrupted reference run
    ref = Trainer(_fresh(pts, rgb), cams, cfg, renderer="tiled")
    ref_losses = {}
    for step in range(1, 25):
        ref_losses[step] = ref.run_step(step).loss

    # run A: crash after step 12 (checkpoint written at 12)
    a = Trainer(_fresh(pts, rgb), cams, cfg, renderer="tiled")
    for step in range(1, 13):
        a.run_step(step)
    ckpt = str(tmp_path / "ckpt_12.npz")
    save_checkpoint(a.state, 12, ckpt, sampler_draws=a.sampler.draws)
    del a  # the crash

    # run B: restore and continue 13..24
    state, step0, draws = load_checkpoint(ckpt)
    assert step0 == 12 and draws == 12
    b = Trainer(state, cams, cfg, renderer="tiled")
    b.sampler.fast_forward(draws)
    b_losses = {}
    for step in range(step0 + 1, 25):
        b_losses[step] = b.run_step(step).loss

    # the resumed trajectory IS the uninterrupted one
    for step in range(13, 25):
        np.testing.assert_allclose(
            b_losses[step], ref_losses[step], rtol=1e-5,
            err_msg=f"step {step}",
        )
    np.testing.assert_array_equal(
        np.asarray(b.state.alive), np.asarray(ref.state.alive)
    )
    for name in ("means", "scales", "quats", "features_dc",
                 "features_rest", "opacities"):
        np.testing.assert_allclose(
            np.asarray(getattr(b.state.params, name)),
            np.asarray(getattr(ref.state.params, name)),
            rtol=1e-5, atol=1e-7, err_msg=name,
        )
    # optimizer moments continue exactly too (native checkpoint carries
    # them; PLY resume cannot)
    np.testing.assert_allclose(
        np.asarray(b.state.opt.mu.means),
        np.asarray(ref.state.opt.mu.means), rtol=1e-5, atol=1e-8,
    )
    assert int(b.state.opt.count) == int(ref.state.opt.count)


def test_cli_auto_resume(tmp_path):
    """--checkpoint-every + --auto-resume end-to-end: a run that stops at
    step 16 leaves ckpt_8/ckpt_16; a second invocation with --auto-resume
    picks the NEWEST checkpoint, continues to 24, and matches the
    uninterrupted 24-step run's saved scene."""
    # build the project inline (the fixture is module-scoped elsewhere)
    import test_cli_e2e as e2e

    class _F:
        def mktemp(self, name):
            p = tmp_path / name
            p.mkdir()
            return p

    project = e2e.synthetic_project.__wrapped__(_F())

    from opensplat_tpu import cli
    from opensplat_tpu.io.scene_io import load_ply

    common = [
        project, "--sh-degree", "1", "--num-downscales", "0",
        "--warmup-length", "500", "--capacity", "256",
        "--renderer", "dense",
    ]

    # reference run to 24 steps, checkpointing every 8 (the LR decay
    # schedule is keyed to num_iters, so the "crashed" run must share
    # the same -n; the crash is simulated by deleting the post-crash
    # checkpoint and final scene)
    ref_out = str(tmp_path / "run" / "scene.ply")
    ckpt_dir = str(tmp_path / "run" / "ckpts")
    os.makedirs(os.path.dirname(ref_out))
    assert cli.main(common + [
        "-o", ref_out, "-n", "24",
        "--checkpoint-every", "8", "--ckpt-dir", ckpt_dir,
    ]) == 0
    assert os.path.exists(os.path.join(ckpt_dir, "ckpt_8.npz"))
    assert os.path.exists(os.path.join(ckpt_dir, "ckpt_16.npz"))
    os.remove(os.path.join(ckpt_dir, "ckpt_24.npz"))  # the crash

    # resumed run: --auto-resume must pick ckpt_16 (not ckpt_8) and
    # reproduce the uninterrupted trajectory 17..24 exactly
    out2 = str(tmp_path / "run" / "resumed.ply")
    assert cli.main(common + [
        "-o", out2, "-n", "24",
        "--auto-resume", "--ckpt-dir", ckpt_dir,
    ]) == 0

    ref_state, _ = load_ply(ref_out, capacity=256)
    res_state, _ = load_ply(out2, capacity=256)
    np.testing.assert_array_equal(
        np.asarray(ref_state.alive), np.asarray(res_state.alive)
    )
    for name in ("means", "scales", "quats", "features_dc", "opacities"):
        np.testing.assert_allclose(
            np.asarray(getattr(res_state.params, name)),
            np.asarray(getattr(ref_state.params, name)),
            rtol=1e-5, atol=1e-6, err_msg=name,
        )
