"""Masked functional Adam must match torch::optim::Adam exactly."""
import numpy as np
import jax.numpy as jnp

from opensplat_tpu.optim.adam import adam_init, adam_update, means_lr_schedule


def test_adam_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(6, 3)).astype(np.float32)
    grads = [rng.normal(size=(6, 3)).astype(np.float32) for _ in range(5)]
    lr = 0.01

    tp = torch.tensor(p0, requires_grad=True)
    topt = torch.optim.Adam([tp], lr=lr)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.tensor(g)
        topt.step()

    params = {"p": jnp.asarray(p0)}
    opt = adam_init(params)
    alive = jnp.ones(6, bool)
    for g in grads:
        params, opt = adam_update(params, {"p": jnp.asarray(g)}, opt, {"p": lr}, alive)

    np.testing.assert_allclose(
        np.asarray(params["p"]), tp.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_adam_mask_freezes_rows():
    rng = np.random.default_rng(1)
    p0 = rng.normal(size=(4, 2)).astype(np.float32)
    params = {"p": jnp.asarray(p0)}
    opt = adam_init(params)
    alive = jnp.asarray([True, False, True, False])
    g = {"p": jnp.asarray(rng.normal(size=(4, 2)).astype(np.float32))}
    params, opt = adam_update(params, g, opt, {"p": 0.1}, alive)
    out = np.asarray(params["p"])
    np.testing.assert_allclose(out[1], p0[1])
    np.testing.assert_allclose(out[3], p0[3])
    assert np.abs(out[0] - p0[0]).max() > 1e-4
    assert np.all(np.asarray(opt.mu["p"])[1] == 0)


def test_means_lr_schedule_matches_reference():
    # optim_scheduler.cpp:4-8: exp(log(init)*(1-t) + log(final)*t)
    lr_init, lr_final, max_steps = 0.00016, 0.0000016, 30000
    for step, want_t in [(0, 0.0), (15000, 0.5), (30000, 1.0), (45000, 1.0)]:
        got = float(means_lr_schedule(lr_init, lr_final, max_steps, step))
        want = float(np.exp(np.log(lr_init) * (1 - want_t) + np.log(lr_final) * want_t))
        np.testing.assert_allclose(got, want, rtol=1e-6)
