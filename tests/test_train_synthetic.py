"""End-to-end training on a synthetic scene (the reference's simple_trainer
analogue, simple_trainer.cpp:24-212): targets are renders of a ground-truth
Gaussian set; training from jittered init must converge, and the full
densify/cull/reset machinery must run under jit without recompilation
churn or NaNs."""
import numpy as np
import jax
import jax.numpy as jnp

from opensplat_tpu.config import TrainConfig
from opensplat_tpu.data.dataset import Camera
from opensplat_tpu.models.gaussians import init_model
from opensplat_tpu.models.splat_model import render_forward, DEFAULT_BACKGROUND
from opensplat_tpu.train import Trainer, sh_degrees_for_step, get_downscale_factor


def _look_at(eye, target, up=(0, 1, 0)):
    eye = np.asarray(eye, np.float64)
    forward = np.asarray(target, np.float64) - eye
    forward /= np.linalg.norm(forward)
    right = np.cross(forward, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    true_up = np.cross(right, forward)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = -forward  # OpenGL: camera looks down -z
    c2w[:3, 3] = eye
    return c2w


def _make_cameras(n_cams=4, radius=8.0, H=64, W=64, f=70.0):
    cams = []
    for i in range(n_cams):
        a = 2 * np.pi * i / n_cams
        eye = (radius * np.sin(a), 0.5, radius * np.cos(a))
        cams.append(
            Camera(
                width=W, height=H, fx=f, fy=f, cx=W / 2, cy=H / 2,
                cam_to_world=_look_at(eye, (0, 0, 0)), file_path=f"cam{i}.png",
            )
        )
    return cams


def _ground_truth_state(n=48, seed=5, capacity=64):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    rgb = rng.integers(30, 225, (n, 3)).astype(np.uint8)
    state = init_model(pts, rgb, sh_degree=1, capacity=capacity, seed=7)
    # make ground truth blobs chunky and opaque
    params = state.params
    params = params.replace(
        scales=jnp.where(state.alive[:, None], jnp.log(0.25), params.scales),
        opacities=jnp.where(state.alive[:, None], 2.0, params.opacities),
    )
    return state.replace(params=params)


def _render_targets(state, cams, sh_deg=1):
    imgs = []
    for cam in cams:
        out = render_forward(
            state.params, state.alive,
            jnp.asarray(cam.cam_to_world), cam.fx, cam.fy, cam.cx, cam.cy,
            cam.height, cam.width, sh_deg,
            jnp.asarray(DEFAULT_BACKGROUND, jnp.float32),
        )
        imgs.append(np.asarray(out.rgb))
    return imgs


def test_training_converges_with_refine():
    cams = _make_cameras()
    gt_state = _ground_truth_state()
    targets = _render_targets(gt_state, cams)
    for cam, img in zip(cams, targets):
        cam.set_image(img)

    # init from jittered ground-truth points
    rng = np.random.default_rng(0)
    pts = np.asarray(gt_state.params.means)[np.asarray(gt_state.alive)]
    pts = pts + rng.normal(0, 0.08, pts.shape).astype(np.float32)
    rgb = rng.integers(0, 255, (pts.shape[0], 3)).astype(np.uint8)

    cfg = TrainConfig(
        num_iters=240,
        sh_degree=1,
        sh_degree_interval=40,
        refine_every=25,
        warmup_length=30,
        reset_alpha_every=3,
        num_downscales=1,
        resolution_schedule=60,
        capacity_round=128,
    )
    state = init_model(pts, rgb, sh_degree=1, capacity=256, capacity_round=128, seed=3)
    trainer = Trainer(state, cams, cfg)

    losses = []
    for step in range(1, 121):
        out = trainer.run_step(step)
        losses.append(out.loss)
        assert np.isfinite(out.loss), f"non-finite loss at step {step}"

    start = np.mean(losses[:5])
    end = np.mean(losses[-5:])
    # 0.65: trajectory shifts slightly with storage order (Morton init)
    assert end < 0.65 * start, f"did not converge: {start} -> {end}"
    # densification ran (steps 126..: beyond 120 not reached; check refine
    # machinery was exercised by alive-count bookkeeping)
    assert trainer.refine_metrics is not None
    n_alive = int(jnp.sum(trainer.state.alive))
    assert 0 < n_alive <= trainer.state.alive.shape[0]
    # all params stayed finite (dead slots too — Adam must freeze them)
    for leaf in jax.tree.leaves(trainer.state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_schedules():
    cfg = TrainConfig(num_iters=30000)
    assert get_downscale_factor(1, cfg) == 4
    assert get_downscale_factor(3000, cfg) == 2
    assert get_downscale_factor(6000, cfg) == 1
    assert get_downscale_factor(29999, cfg) == 1
    assert sh_degrees_for_step(1, cfg) == 0
    assert sh_degrees_for_step(1000, cfg) == 1
    assert sh_degrees_for_step(5000, cfg) == 3


def test_budget_hysteresis():
    """Adaptive isect budgets: set on first observation, grow on
    overflow, shrink only past the hysteresis band (bounded recompiles)."""
    from opensplat_tpu.config import TrainConfig
    from opensplat_tpu.train import Trainer

    tr = Trainer.__new__(Trainer)  # no device work needed
    tr.renderer = "pallas"
    tr._isect_budgets = {}
    B = Trainer._BUDGET_BUCKET

    m = Trainer._BUDGET_MARGIN
    tr._update_budget(64, 64, 500_000, 400_000, 200_000)
    first = tr._budget_for(64, 64)
    assert first[0] >= int(500_000 * m)
    assert first[1] >= int(400_000 * m)
    assert first[2] >= int(200_000 * m)
    assert all(b % B == 0 for b in first)

    # small fluctuation: no change
    tr._update_budget(64, 64, 480_000, 390_000, 190_000)
    assert tr._budget_for(64, 64) == first

    # overflow: grow (each budget independently)
    tr._update_budget(64, 64, first[0] + 1, first[1] + 1, first[2] + 1)
    grown = tr._budget_for(64, 64)
    assert grown[0] > first[0] and grown[1] > first[1]
    assert grown[2] > first[2]

    # massive shrink: allowed to come back down
    tr._update_budget(64, 64, 50_000, 40_000, 20_000)
    shrunk = tr._budget_for(64, 64)
    assert shrunk[0] < first[0] and shrunk[1] < first[1]
    assert shrunk[2] < first[2]

    # dense renderer never budgets
    tr2 = Trainer.__new__(Trainer)
    tr2.renderer = "dense"
    tr2._isect_budgets = {}
    tr2._update_budget(64, 64, 100_000, 100_000, 100_000)
    assert tr2._budget_for(64, 64) == (0, 0, 0)


def test_overflow_is_logged_and_regrown(capsys):
    """An undersized isect budget must produce a visible overflow log at
    the next sync point and regrow the budget (SURVEY.md §7 hard-part 3:
    no silent truncation) — including overflow at steps BETWEEN host sync
    points, carried by the device-side pending-demand max."""
    cams = _make_cameras(n_cams=2, H=64, W=64)
    gt_state = _ground_truth_state()
    targets = _render_targets(gt_state, cams)
    for cam, img in zip(cams, targets):
        cam.set_image(img)

    pts = np.asarray(gt_state.params.means)[np.asarray(gt_state.alive)]
    rgb = np.full((pts.shape[0], 3), 128, np.uint8)
    cfg = TrainConfig(
        num_iters=100, sh_degree=1, num_downscales=0, refine_every=1000,
        capacity_round=64,
    )
    state = init_model(pts, rgb, sh_degree=1, capacity=64,
                       capacity_round=64, seed=3)
    trainer = Trainer(state, cams, cfg, renderer="tiled")

    # deliberately undersized budgets for this scene
    trainer._isect_budgets[(64, 64)] = (128, 128, 128)
    # steps 4..9 are NOT sync points: overflow there must still be seen
    # at step 10 via the pending-demand max
    for step in range(4, 11):
        trainer.run_step(step)
    out = capsys.readouterr().out
    assert "budget overflow" in out, out
    assert "dropped" in out
    assert trainer.overflow_events >= 1
    grown = trainer._budget_for(64, 64)
    assert grown[1] > 128  # layout budget regrew

    # and the regrown budget now covers the demand (no further overflow)
    trainer.overflow_events = 0
    for step in range(11, 21):
        trainer.run_step(step)
    assert trainer.overflow_events == 0


def test_render_budget_feedback():
    """Trainer.render never returns a silently-truncated frame: with an
    undersized budget it regrows and re-renders; the result matches a
    render with a generous budget."""
    cams = _make_cameras(n_cams=1, H=64, W=64)
    gt_state = _ground_truth_state()
    cfg = TrainConfig(num_iters=100, sh_degree=1, num_downscales=0)
    trainer = Trainer(gt_state, cams, cfg, renderer="tiled")

    trainer._isect_budgets[(64, 64)] = (128, 128, 128)
    img = np.asarray(trainer.render(cams[0], step=50))
    assert trainer._budget_for(64, 64)[1] > 128

    trainer2 = Trainer(gt_state, cams, cfg, renderer="tiled")
    trainer2._isect_budgets[(64, 64)] = (1 << 16, 1 << 16, 1 << 16)
    ref = np.asarray(trainer2.render(cams[0], step=50))
    np.testing.assert_allclose(img, ref, atol=1e-5)


def test_gt_device_cache():
    """The device-resident GT cache returns the same pixels as the host
    pyramid, hits on revisits (one device array per (camera, factor)),
    and LRU-evicts under the byte budget; gt_cache_mb=0 disables it."""
    cams = _make_cameras(n_cams=3, H=32, W=32)
    gt_state = _ground_truth_state()
    for cam, img in zip(cams, _render_targets(gt_state, cams)):
        cam.set_image(img)

    cfg = TrainConfig(num_iters=100, sh_degree=1, num_downscales=0)
    tr = Trainer(gt_state, cams, cfg)

    a = tr._gt_on_device(0, 1)
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(cams[0].get_image(1), np.float32)
    )
    assert tr._gt_on_device(0, 1) is a  # hit: the SAME device array
    assert tr._gt_cache_used == a.nbytes

    # budget = 2 images -> inserting a 3rd evicts the least-recent (cam 0)
    tr._gt_cache_budget = 2 * a.nbytes
    tr._gt_on_device(1, 1)
    tr._gt_on_device(2, 1)
    assert (0, 1) not in tr._gt_cache
    assert {(1, 1), (2, 1)} == set(tr._gt_cache)
    assert tr._gt_cache_used == 2 * a.nbytes

    off = Trainer(gt_state, cams, TrainConfig(num_iters=100, gt_cache_mb=0))
    off._gt_on_device(0, 1)
    assert not off._gt_cache and off._gt_cache_used == 0

    # run_step consumes the cache and trains normally
    out = tr.run_step(1)
    assert np.isfinite(out.loss)
    assert len(tr._gt_cache) >= 2
