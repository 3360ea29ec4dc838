"""Nonfinite-gradient sanitization regression (round-5 fix).

Long runs drive some splats degenerate (scale ratios ~1e5, opacity ~1,
observed at step ~4129 of the 6k-step 1080p quality run); their f32
rasterizer-backward gradients can overflow. Unguarded, one nonfinite
record poisoned its ENTIRE 512-Gaussian segment-sum block on the pallas
path (NaN x 0 = NaN through the one-hot reduction matmul) and the row's
own parameters on the tiled path. Both fast paths now zero nonfinite
gradient values at emission.

This is a CANARY, not a full reproduction: the overflow needs the
full-scene 1080p state (the fix was verified by replaying the exact
poison step from the archived checkpoint — 510 NaN rows before, 0
after; see PERF.md "Measured quality"). Here a small scene seeded with
the observed offender pattern pins that degenerate splats produce
finite gradients for every alive Gaussian through both fast paths.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opensplat_tpu.models.gaussians import init_model
from opensplat_tpu.models.splat_model import DEFAULT_BACKGROUND, render_forward
from opensplat_tpu.ops.ssim import main_loss


def _degenerate_state(n=1024, n_bad=16, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.concatenate(
        [rng.uniform(-1.0, 1.0, (n, 2)), rng.uniform(-8.0, -4.0, (n, 1))],
        axis=-1,
    ).astype(np.float32)
    rgb = rng.integers(0, 255, (n, 3)).astype(np.uint8)
    state = init_model(pts, rgb, sh_degree=1, capacity=n, seed=seed)
    # degenerate splats modeled on the observed offenders: log-scales
    # like (-15, -1.8, -8.5) (axis ratios ~1e5) and opacity logit ~12
    bad = rng.choice(n, n_bad, replace=False)
    scales = np.asarray(state.params.scales).copy()
    opac = np.asarray(state.params.opacities).copy()
    scales[bad] = np.array([-15.1, -1.78, -8.55], np.float32)
    opac[bad] = 12.0
    params = state.params.replace(
        scales=jnp.asarray(scales), opacities=jnp.asarray(opac)
    )
    return state.replace(params=params), bad


@pytest.mark.parametrize("renderer", ["tiled", "pallas"])
def test_degenerate_splats_finite_grads(renderer):
    state, bad = _degenerate_state()
    h = w = 64
    c2w = jnp.eye(4, dtype=jnp.float32)
    gt = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (h, w, 3)), jnp.float32
    )

    def loss_fn(params):
        out = render_forward(
            params, state.alive, c2w, 80.0, 80.0, w / 2.0, h / 2.0, h, w, 1,
            jnp.asarray(DEFAULT_BACKGROUND, jnp.float32), renderer=renderer,
        )
        return main_loss(out.rgb, gt, 0.2)

    g = jax.grad(loss_fn)(state.params)
    for name in ("means", "scales", "quats", "features_dc", "opacities"):
        v = np.asarray(getattr(g, name))
        assert np.isfinite(v).all(), (
            f"{renderer}: nonfinite {name} grads at rows "
            f"{np.where(~np.isfinite(v.reshape(v.shape[0], -1)).all(1))[0][:8]}"
        )
    # the scene still renders and produces useful signal
    assert float(jnp.abs(g.means).max()) > 0.0
