"""Spherical harmonics parity vs the NumPy oracle, all degrees."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opensplat_tpu.ops import spherical_harmonics, num_sh_bases, rgb_to_sh, sh_to_rgb
from opensplat_tpu.oracle import np_sh_forward


@pytest.mark.parametrize("degree", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("degrees_to_use", [0, 1, 2, 3, 4])
def test_sh_forward_matches_oracle(degree, degrees_to_use):
    if degrees_to_use > degree:
        pytest.skip("unused combination")
    rng = np.random.default_rng(degree * 10 + degrees_to_use)
    n = 64
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    coeffs = rng.normal(size=(n, num_sh_bases(degree), 3)).astype(np.float32)
    got = spherical_harmonics(degrees_to_use, jnp.asarray(dirs), jnp.asarray(coeffs))
    want = np_sh_forward(degree, degrees_to_use, dirs, coeffs)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_sh_gradient_is_basis_outer_product():
    # reference backward: v_coeffs = basis[..., None] * v_colors (sh.cuh:126-216)
    rng = np.random.default_rng(7)
    n = 16
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    coeffs = rng.normal(size=(n, 16, 3)).astype(np.float32)
    v_colors = rng.normal(size=(n, 3)).astype(np.float32)

    def f(c):
        return jnp.sum(spherical_harmonics(3, jnp.asarray(dirs), c) * v_colors)

    grad = np.asarray(jax.grad(f)(jnp.asarray(coeffs)))
    from opensplat_tpu.ops.sh import eval_sh_basis

    basis = np.asarray(eval_sh_basis(3, 3, jnp.asarray(dirs)))
    want = basis[:, :, None] * v_colors[:, None, :]
    np.testing.assert_allclose(grad, want, rtol=1e-5, atol=1e-6)


def test_rgb_sh_roundtrip():
    rgb = jnp.asarray(np.linspace(0.05, 0.95, 30, dtype=np.float32).reshape(10, 3))
    np.testing.assert_allclose(
        np.asarray(sh_to_rgb(rgb_to_sh(rgb))), np.asarray(rgb), rtol=1e-6, atol=1e-6
    )
