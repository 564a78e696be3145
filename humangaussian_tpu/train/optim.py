"""Per-group Adam for the Gaussian scene, with the reference's LR schedule.

Mirrors GaussianModel.training_setup
(/root/reference/gaussiansplatting/scene/gaussian_model.py:149-169):
six parameter groups with fixed LRs (defaults from
arguments/__init__.py:70-88, scaled by spatial_lr_scale for positions)
except xyz, whose LR follows the Plenoxels-style log-linear decay
(utils/general_utils.py:29-60). Adam eps = 1e-15 as upstream.

Implemented by hand (20 lines) instead of optax so densification can
surgically zero the moment slots of reallocated Gaussians
(densify._zero_moments_at) without depending on optax internals.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GaussianOptimConfig:
    """arguments/__init__.py:70-88 defaults."""

    position_lr_init: float = 0.00005
    position_lr_final: float = 0.000025
    position_lr_delay_mult: float = 0.5
    position_lr_delay_steps: int = 0
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0125
    opacity_lr: float = 0.01
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    spatial_lr_scale: float = 4.0  # = cameras_extent (GaussianDreamer.py:130)
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-15

    def group_lrs(self, step) -> dict:
        """Current per-group learning rates (xyz is step-dependent)."""
        return {
            "means": expon_lr(
                step,
                self.position_lr_init * self.spatial_lr_scale,
                self.position_lr_final * self.spatial_lr_scale,
                self.position_lr_delay_steps,
                self.position_lr_delay_mult,
                self.position_lr_max_steps,
            ),
            "sh_dc": self.feature_lr,
            "sh_rest": self.feature_lr / 20.0,
            "opacity_logits": self.opacity_lr,
            "log_scales": self.scaling_lr,
            "quats": self.rotation_lr,
        }


def expon_lr(
    step, lr_init, lr_final, delay_steps=0, delay_mult=1.0, max_steps=1_000_000
):
    """Log-linear LR decay with optional sine warm-delay
    (general_utils.py:29-60). `step` may be traced."""
    step = jnp.asarray(step, jnp.float32)
    if delay_steps > 0:
        delay_rate = delay_mult + (1.0 - delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / delay_steps, 0.0, 1.0)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(
        jnp.log(lr_init) * (1.0 - t) + jnp.log(lr_final) * t
    )
    return delay_rate * log_lerp * (step >= 0)


class AdamState(NamedTuple):
    mu: dict  # first moments, same pytree as params
    nu: dict  # second moments
    count: jnp.ndarray  # [] int32


def adam_init(params: dict) -> AdamState:
    return AdamState(
        mu=jax.tree.map(jnp.zeros_like, params),
        nu=jax.tree.map(jnp.zeros_like, params),
        count=jnp.zeros((), jnp.int32),
    )


def adam_step(
    params: dict,
    grads: dict,
    state: AdamState,
    lrs: dict,
    cfg: GaussianOptimConfig = GaussianOptimConfig(),
):
    """One Adam update with per-group LRs. Returns (params, state).

    NOTE on bias correction with moment surgery: the reference rewrites
    the torch Adam `state` per Gaussian but keeps each tensor's shared
    `step` counter, so freshly (re)allocated Gaussians inherit the global
    bias correction; we reproduce that by keeping one global count.
    """
    count = state.count + 1
    b1, b2 = cfg.beta1, cfg.beta2
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)

    new_mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    new_nu = jax.tree.map(
        lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads
    )

    def update(name):
        def f(p, m, v):
            mhat = m / c1
            vhat = v / c2
            return p - lrs[name] * mhat / (jnp.sqrt(vhat) + cfg.eps)

        return f

    new_params = {
        k: update(k)(params[k], new_mu[k], new_nu[k]) for k in params
    }
    return new_params, AdamState(mu=new_mu, nu=new_nu, count=count)
