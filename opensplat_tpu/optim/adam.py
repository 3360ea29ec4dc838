"""Functional Adam with row masking, matching torch::optim::Adam semantics
(the reference uses six independent Adam instances, model.cpp:58-69).

torch Adam update (defaults beta1=0.9, beta2=0.999, eps=1e-8):
    m_t = b1 m + (1-b1) g ; v_t = b2 v + (1-b2) g^2
    p  -= lr * (m_t / (1-b1^t)) / (sqrt(v_t / (1-b2^t)) + eps)

Row masking replaces the reference's Adam-state surgery
(addToOptimizer/removeFromOptimizer, model.cpp:253-309): dead capacity
slots are frozen (their moments and values untouched), newly-activated
slots start with zeroed moments — exactly what concatenating zero-state
rows achieves in the reference. The shared step count `t` is per
parameter group in torch; since all six groups step together every
iteration, a single counter reproduces it.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

BETA1 = 0.9
BETA2 = 0.999
EPS = 1e-8


@struct.dataclass
class AdamState:
    mu: Any  # pytree matching params
    nu: Any
    count: jax.Array  # () int32


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     count=jnp.zeros((), jnp.int32))


def _masked_leaf_update(p, g, m, v, lr, c, row_mask):
    mask = row_mask.reshape((-1,) + (1,) * (p.ndim - 1)).astype(p.dtype)
    m_new = BETA1 * m + (1.0 - BETA1) * g
    v_new = BETA2 * v + (1.0 - BETA2) * (g * g)
    bc1 = 1.0 - BETA1 ** c
    bc2 = 1.0 - BETA2 ** c
    step = lr * (m_new / bc1) / (jnp.sqrt(v_new / bc2) + EPS)
    p_new = p - mask * step
    m_new = mask * m_new + (1.0 - mask) * m
    v_new = mask * v_new + (1.0 - mask) * v
    return p_new, m_new, v_new


def adam_update(params, grads, opt: AdamState, lrs, alive: jax.Array):
    """One masked Adam step.

    params/grads: pytrees of (C, ...) arrays; lrs: matching pytree of scalar
    learning rates (traced or static); alive: (C,) bool row mask.
    """
    count = opt.count + 1
    c = count.astype(jnp.float32)
    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(opt.mu)
    flat_v = treedef.flatten_up_to(opt.nu)
    flat_lr = treedef.flatten_up_to(lrs)
    new_p, new_m, new_v = [], [], []
    for p, g, m, v, lr in zip(flat_p, flat_g, flat_m, flat_v, flat_lr):
        pn, mn, vn = _masked_leaf_update(p, g, m, v, lr, c, alive)
        new_p.append(pn)
        new_m.append(mn)
        new_v.append(vn)
    return (
        treedef.unflatten(new_p),
        AdamState(mu=treedef.unflatten(new_m), nu=treedef.unflatten(new_v), count=count),
    )


def means_lr_schedule(lr_init: float, lr_final: float, max_steps: int, step):
    """Log-linear decay (optim_scheduler.cpp:4-8). The reference calls
    scheduler.step(t) AFTER the optimizer step at iteration t, so the
    optimizer at step t uses lr(t-1) with lr(0) = lr_init — pass step-1."""
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    return jnp.exp(jnp.log(lr_init) * (1.0 - t) + jnp.log(lr_final) * t)
