"""Multi-device tests on the virtual 8-device CPU mesh (conftest.py):
camera-DP + Gaussian-sharded batched train step — the scaling layer the
reference lacks (SURVEY.md §5; README.md:268 lists multi-machine as an
open goal)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from opensplat_tpu.config import TrainConfig
from opensplat_tpu.models.gaussians import init_model
from opensplat_tpu.optim.adam import means_lr_schedule
from opensplat_tpu.parallel.mesh import make_mesh, shard_params
from opensplat_tpu.parallel.sharded_train import batched_train_step
from opensplat_tpu.train import train_step

H = W = 32
CAPACITY = 128


def _scene(n_cams):
    rng = np.random.default_rng(11)
    pts = rng.uniform(-1.0, 1.0, (96, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (96, 3)).astype(np.uint8)
    state = init_model(pts, rgb, sh_degree=1, capacity=CAPACITY, seed=3)

    def look_at(eye):
        eye = np.asarray(eye, np.float64)
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
        return c2w

    cams = np.stack([
        look_at((5 * np.sin(2 * np.pi * i / n_cams), 0.5,
                 5 * np.cos(2 * np.pi * i / n_cams)))
        for i in range(n_cams)
    ])
    gts = np.clip(
        rng.uniform(0, 1, (n_cams, H, W, 3)), 0, 1
    ).astype(np.float32)
    return state, cams, gts


def _batched_args(cams, gts, d):
    return dict(
        cam_to_world=jnp.asarray(cams[:d]),
        fx=jnp.full((d,), 40.0), fy=jnp.full((d,), 40.0),
        cx=jnp.full((d,), W / 2.0), cy=jnp.full((d,), H / 2.0),
        gt_images=jnp.asarray(gts[:d]),
    )


CFG = TrainConfig(num_iters=100, capacity_round=CAPACITY)
LR = means_lr_schedule(CFG.lr_means, CFG.lr_means_final, CFG.num_iters, 0)


def test_batched_d1_matches_single_step():
    state, cams, gts = _scene(1)
    args = _batched_args(cams, gts, 1)
    new_b, mb = batched_train_step(
        state, **args, means_lr=LR, height=H, width=W, sh_deg=1,
        cfg=CFG, accumulate=True, renderer="dense",
    )
    new_s, ms = train_step(
        state, args["cam_to_world"][0], 40.0, 40.0, W / 2.0, H / 2.0,
        jnp.asarray(gts[0]), LR, H, W, 1, CFG, True, "dense",
    )
    np.testing.assert_allclose(float(mb["loss"]), float(ms["loss"]), rtol=1e-5)
    for name in ("means", "scales", "quats", "features_dc", "opacities"):
        np.testing.assert_allclose(
            np.asarray(getattr(new_b.params, name)),
            np.asarray(getattr(new_s.params, name)),
            rtol=2e-4, atol=5e-6, err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(new_b.stats.xys_grad_norm),
        np.asarray(new_s.stats.xys_grad_norm),
        rtol=2e-4, atol=1e-8,
    )


def test_camera_dp_on_mesh_matches_unsharded():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    d = 4
    state, cams, gts = _scene(d)
    args = _batched_args(cams, gts, d)

    ref_state, ref_m = batched_train_step(
        state, **args, means_lr=LR, height=H, width=W, sh_deg=1,
        cfg=CFG, accumulate=True, renderer="dense",
    )

    mesh = make_mesh(n_data=d, n_model=2, devices=jax.devices()[:8])
    cam_sh = NamedSharding(mesh, P("data"))
    sh_state = state.replace(params=shard_params(mesh, state.params))
    sh_args = {
        k: jax.device_put(v, cam_sh) for k, v in args.items()
    }
    with mesh:
        new_state, m = batched_train_step(
            sh_state, **sh_args, means_lr=LR, height=H, width=W, sh_deg=1,
            cfg=CFG, accumulate=True, renderer="dense",
        )
    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state.params.means),
        np.asarray(ref_state.params.means),
        rtol=2e-4, atol=1e-6,
    )
    assert int(m["n_visible"]) == int(ref_m["n_visible"])


def test_batched_stats_match_sequential():
    """accumulate_stats_batched reproduces D sequential reference
    accumulations (model.cpp:317-337) from the grads of the MEAN loss —
    incl. the first-accumulation init quirk (camera 0 initializes norms
    for ALL Gaussians and counts to 1) — and yields identical
    split/dup refine masks (VERDICT round-1 weak #7)."""
    from opensplat_tpu.models.densify import _split_dup_masks, accumulate_stats
    from opensplat_tpu.models.gaussians import zero_stats
    from opensplat_tpu.parallel.sharded_train import accumulate_stats_batched

    rng = np.random.default_rng(5)
    d, c = 4, CAPACITY

    def one_round(stats_seq, stats_bat):
        g = rng.normal(0, 2e-4, (d, c, 2)).astype(np.float32)
        radii = (rng.integers(0, 3, (d, c)) * rng.integers(1, 9, (d, c))
                 ).astype(np.int32)  # ~1/3 invisible
        for k in range(d):
            stats_seq = accumulate_stats(
                stats_seq, jnp.asarray(g[k]), jnp.asarray(radii[k]), H, W
            )
        stats_bat = accumulate_stats_batched(
            stats_bat, jnp.asarray(g / d), jnp.asarray(radii), H, W
        )
        return stats_seq, stats_bat

    seq, bat = zero_stats(c), zero_stats(c)
    seq, bat = one_round(seq, bat)   # uninitialized (post-refine) path
    np.testing.assert_allclose(
        np.asarray(bat.xys_grad_norm), np.asarray(seq.xys_grad_norm),
        rtol=1e-5, atol=1e-12,
    )
    np.testing.assert_array_equal(
        np.asarray(bat.vis_counts), np.asarray(seq.vis_counts)
    )
    seq, bat = one_round(seq, bat)   # initialized (accumulating) path
    np.testing.assert_allclose(
        np.asarray(bat.xys_grad_norm), np.asarray(seq.xys_grad_norm),
        rtol=1e-5, atol=1e-12,
    )
    np.testing.assert_array_equal(
        np.asarray(bat.vis_counts), np.asarray(seq.vis_counts)
    )
    np.testing.assert_allclose(
        np.asarray(bat.max_2d_size), np.asarray(seq.max_2d_size), rtol=1e-6
    )

    # identical refine decisions from either stats object
    state, _, _ = _scene(1)
    for use_ss in (False, True):
        s_splits, s_dups = _split_dup_masks(
            state.params, seq, state.alive, float(max(H, W)), CFG, use_ss
        )
        b_splits, b_dups = _split_dup_masks(
            state.params, bat, state.alive, float(max(H, W)), CFG, use_ss
        )
        np.testing.assert_array_equal(np.asarray(s_splits), np.asarray(b_splits))
        np.testing.assert_array_equal(np.asarray(s_dups), np.asarray(b_dups))


def test_gaussian_sharding_layout():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(n_data=2, n_model=4, devices=jax.devices()[:8])
    state, _, _ = _scene(1)
    sharded = shard_params(mesh, state.params)
    # capacity axis split over 'model'
    s = sharded.means.sharding
    assert s.spec[0] == "model"
    np.testing.assert_array_equal(
        np.asarray(sharded.means), np.asarray(state.params.means)
    )
