"""Adan optimizer (Xie et al. 2022) as an optax transformation.

JAX port of the reference's vendored Adan
(/root/reference/threestudio/systems/optimizers.py:23-255): three EMAs
(gradient m_t, gradient-difference diff_t, squared lookahead n_t), bias
corrections, optional global grad-norm clipping and decoupled/proximal
weight decay — the update math mirrors `_single_tensor_adan` exactly.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class AdanState(NamedTuple):
    count: jnp.ndarray  # [] int32
    exp_avg: optax.Params  # m_t
    exp_avg_sq: optax.Params  # n_t
    exp_avg_diff: optax.Params  # diff_t
    neg_pre_grad: optax.Params  # -g_{t-1} (scaled)


def adan(
    learning_rate: float = 1e-3,
    b1: float = 0.98,
    b2: float = 0.92,
    b3: float = 0.99,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    max_grad_norm: float = 0.0,
    no_prox: bool = False,
) -> optax.GradientTransformation:
    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdanState(
            count=jnp.zeros((), jnp.int32),
            exp_avg=zeros,
            exp_avg_sq=jax.tree.map(jnp.zeros_like, params),
            exp_avg_diff=jax.tree.map(jnp.zeros_like, params),
            neg_pre_grad=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(grads, state, params):
        count = state.count + 1
        if max_grad_norm > 0.0:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(max_grad_norm / (gnorm + eps), 1.0)
        else:
            scale = jnp.float32(1.0)
        g = jax.tree.map(lambda x: x * scale, grads)
        # on the first step neg_pre_grad := -g (optimizers.py:164-165)
        first = (count == 1).astype(jnp.float32)
        npg = jax.tree.map(
            lambda n, gi: (1 - first) * n + first * (-gi),
            state.neg_pre_grad, g,
        )
        diff = jax.tree.map(lambda n, gi: n + gi, npg, g)  # g_t - g_{t-1}
        m = jax.tree.map(
            lambda mm, gi: b1 * mm + (1 - b1) * gi, state.exp_avg, g
        )
        d = jax.tree.map(
            lambda dd, df: b2 * dd + (1 - b2) * df, state.exp_avg_diff, diff
        )
        look = jax.tree.map(lambda gi, df: gi + b2 * df, g, diff)
        n = jax.tree.map(
            lambda nn, lk: b3 * nn + (1 - b3) * lk * lk,
            state.exp_avg_sq, look,
        )
        t = count.astype(jnp.float32)
        bc1 = 1.0 - b1**t
        bc2 = 1.0 - b2**t
        bc3_sqrt = jnp.sqrt(1.0 - b3**t)

        def step(param, mm, dd, nn):
            denom = jnp.sqrt(nn) / bc3_sqrt + eps
            upd = (
                learning_rate / bc1 * mm
                + learning_rate * b2 / bc2 * dd
            ) / denom
            if no_prox:
                new = param * (1 - learning_rate * weight_decay) - upd
            else:
                new = (param - upd) / (1 + learning_rate * weight_decay)
            return new - param  # optax convention: return the delta

        updates = jax.tree.map(step, params, m, d, n)
        new_state = AdanState(
            count=count,
            exp_avg=m,
            exp_avg_sq=n,
            exp_avg_diff=d,
            neg_pre_grad=jax.tree.map(lambda gi: -gi, g),
        )
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)
