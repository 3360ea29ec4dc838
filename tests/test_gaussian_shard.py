"""Gaussian-sharded rendering/training on the virtual mesh (SURVEY.md §7
phase 2): capacity axis sharded over 'model', per-camera all-gather of
frustum-compacted subsets, banded rasterization, reduce-scatter of
gradients back to owner shards — parity-tested against the replicated
path, with the compiled collective schedule inspected."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opensplat_tpu.models.splat_model import DEFAULT_BACKGROUND, render_forward
from opensplat_tpu.parallel.gaussian_shard import (
    gs_render,
    gs_train_step,
    shard_state,
)
from opensplat_tpu.parallel.mesh import make_mesh
from opensplat_tpu.train import train_step

from test_parallel import CFG, LR, _scene

H = W = 64
M = 4  # model shards (band height 16 = one tile row each)


def _mesh():
    return make_mesh(n_data=1, n_model=M, devices=jax.devices()[:M])


def _cam_args(cams):
    return dict(
        cam_to_world=jnp.asarray(cams[0]), fx=40.0, fy=40.0,
        cx=W / 2.0, cy=H / 2.0,
    )


@pytest.mark.parametrize("renderer", ["dense", "tiled", "pallas"])
def test_gs_render_matches_replicated(renderer):
    if len(jax.devices()) < M:
        pytest.skip("needs devices")
    state, cams, _ = _scene(1)
    mesh = _mesh()
    sh_state = shard_state(mesh, state)
    args = _cam_args(cams)

    ref = render_forward(
        state.params, state.alive, args["cam_to_world"],
        args["fx"], args["fy"], args["cx"], args["cy"],
        H, W, 1, jnp.asarray(DEFAULT_BACKGROUND, jnp.float32),
        renderer=renderer,
    )
    rgb, n_vis, demand = gs_render(
        sh_state, args["cam_to_world"], args["fx"], args["fy"],
        args["cx"], args["cy"], mesh, H, W, 1,
        v_budget=state.alive.shape[0] // M, renderer=renderer,
    )
    assert int(n_vis) <= state.alive.shape[0] // M
    # (n_cands, n_isects, n_grads) budget feedback (grad demand joined
    # the vector with the r4 compact gradient layout)
    assert demand.shape == (3,)
    np.testing.assert_allclose(
        np.asarray(rgb), np.asarray(ref.rgb), rtol=1e-5, atol=1e-5
    )


def test_gs_train_step_matches_unsharded():
    """One Gaussian-sharded training step == the replicated train_step:
    parameters, densify statistics (radii visibility crossing band
    boundaries included), loss."""
    if len(jax.devices()) < M:
        pytest.skip("needs devices")
    state, cams, _ = _scene(1)
    mesh = _mesh()
    sh_state = shard_state(mesh, state)
    args = _cam_args(cams)
    gt = jnp.asarray(
        np.random.default_rng(7).uniform(0, 1, (H, W, 3)), jnp.float32
    )

    ref_state, ref_m = train_step(
        state, args["cam_to_world"], args["fx"], args["fy"], args["cx"],
        args["cy"], gt, LR, H, W, 1, CFG, True, "dense",
    )
    new_state, m = gs_train_step(
        sh_state, args["cam_to_world"], args["fx"], args["fy"], args["cx"],
        args["cy"], gt, LR, mesh, H, W, 1, CFG, True,
        v_budget=state.alive.shape[0] // M, renderer="dense",
    )
    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]), rtol=1e-5)
    assert int(m["n_visible"]) == int(ref_m["n_visible"])
    for name in ("means", "scales", "quats", "features_dc", "opacities"):
        np.testing.assert_allclose(
            np.asarray(getattr(new_state.params, name)),
            np.asarray(getattr(ref_state.params, name)),
            rtol=2e-4, atol=1e-5, err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(new_state.stats.xys_grad_norm),
        np.asarray(ref_state.stats.xys_grad_norm),
        rtol=2e-4, atol=1e-8,
    )
    np.testing.assert_array_equal(
        np.asarray(new_state.stats.vis_counts),
        np.asarray(ref_state.stats.vis_counts),
    )


def test_gs_collective_schedule():
    """The compiled step contains exactly the collectives the design
    calls for: an all-gather (visible subsets) in the forward and a
    reduce-scatter (gradient return) in the backward."""
    if len(jax.devices()) < M:
        pytest.skip("needs devices")
    state, cams, _ = _scene(1)
    mesh = _mesh()
    sh_state = shard_state(mesh, state)
    args = _cam_args(cams)
    gt = jnp.zeros((H, W, 3), jnp.float32)

    lowered = gs_train_step.lower(
        sh_state, args["cam_to_world"], args["fx"], args["fy"], args["cx"],
        args["cy"], gt, LR, mesh, H, W, 1, CFG, True,
        v_budget=state.alive.shape[0] // M, renderer="dense",
    )
    hlo = lowered.compile().as_text()
    assert "all-gather" in hlo or "all-gather-start" in hlo, "no all-gather"
    assert "reduce-scatter" in hlo, "no reduce-scatter"


@pytest.mark.parametrize("renderer", ["dense", "tiled", "pallas"])
def test_dpgs_hybrid_matches_dp_replicated(renderer):
    """Hybrid camera-DP x Gaussian-MP on a 2x2 (data, model) mesh equals
    the replicated camera-DP step (itself pinned to D sequential
    reference steps): same loss, fp-tolerance-equal parameter updates
    through the reduce-scatter+psum transpose chain, and identical
    densify-stat fold. Includes the pallas renderer (interpret mode on
    the CPU mesh): shard_map around the opaque Pallas custom calls on
    BOTH mesh axes is the highest-risk partitioner composition."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from opensplat_tpu.parallel.dp_trainer import dp_train_step
    from opensplat_tpu.parallel.gaussian_shard import dpgs_train_step

    d = 2
    state, cams, _ = _scene(d)
    gts = np.random.default_rng(5).uniform(
        0, 1, (d, H, W, 3)
    ).astype(np.float32)
    hy_mesh = make_mesh(n_data=d, n_model=2, devices=jax.devices()[:4])
    dp_mesh = make_mesh(n_data=d, n_model=1, devices=jax.devices()[:d])

    cam_args = dict(
        cam_to_world=jnp.asarray(cams),
        fx=jnp.full((d,), 40.0), fy=jnp.full((d,), 40.0),
        cx=jnp.full((d,), W / 2.0), cy=jnp.full((d,), H / 2.0),
        gt_images=jnp.asarray(gts),
    )

    ref_state, ref_m = dp_train_step(
        jax.device_put(state, NamedSharding(dp_mesh, P())),
        cam_args["cam_to_world"], cam_args["fx"], cam_args["fy"],
        cam_args["cx"], cam_args["cy"], cam_args["gt_images"], LR,
        jnp.zeros((3,), jnp.int32), dp_mesh, H, W, 1, CFG, True,
        renderer, d_local=1,
    )

    hy_state, hy_m = dpgs_train_step(
        shard_state(hy_mesh, state),
        cam_args["cam_to_world"], cam_args["fx"], cam_args["fy"],
        cam_args["cx"], cam_args["cy"], cam_args["gt_images"], LR,
        hy_mesh, H, W, 1, CFG, True,
        v_budget=state.alive.shape[0] // 2, renderer=renderer,
    )

    np.testing.assert_allclose(
        float(hy_m["loss"]), float(ref_m["loss"]), rtol=1e-5
    )
    # V feedback flows (demand = [n_cands, n_isects, n_grads, n_vis]
    # since the r4 compact-gradient layout added n_grads at index 2)
    assert int(np.asarray(hy_m["demand"])[3]) > 0
    for name in ("means", "scales", "quats", "features_dc",
                 "features_rest", "opacities"):
        np.testing.assert_allclose(
            np.asarray(getattr(hy_state.params, name)),
            np.asarray(getattr(ref_state.params, name)),
            rtol=2e-4, atol=1e-5, err_msg=name,
        )
    for name in ("xys_grad_norm", "vis_counts", "max_2d_size"):
        np.testing.assert_allclose(
            np.asarray(getattr(hy_state.stats, name)),
            np.asarray(getattr(ref_state.stats, name)),
            rtol=1e-4, atol=1e-6, err_msg=name,
        )
