"""Diffusion noise schedules: DDPM/DDIM math as pure JAX functions.

Replaces the diffusers DDIMScheduler the reference configures at
/root/reference/threestudio/models/guidance/dual_branch_guidance.py:163-175:
scaled-linear betas (SD2-base: 0.00085 -> 0.012 over 1000 steps),
**v-prediction**, **zero-terminal-SNR rescale** (Lin et al., "Common
Diffusion Noise Schedules and Sample Steps are Flawed"), **trailing**
timestep spacing for inference.

The rescaled `alphas_cumprod` is what the guidance reads for both
`add_noise` and the SDS weighting w(t) = 1 - alpha_bar_t
(dual_branch_guidance.py:178-181,399-407).
"""
from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


def _rescale_zero_terminal_snr(alphas_cumprod: np.ndarray) -> np.ndarray:
    """diffusers rescale_zero_terminal_snr: shift/scale sqrt(alpha_bar) so
    the terminal step has SNR exactly 0 while step 0 is preserved."""
    abar_sqrt = np.sqrt(alphas_cumprod)
    a_first = abar_sqrt[0]
    a_last = abar_sqrt[-1]
    abar_sqrt = abar_sqrt - a_last
    abar_sqrt = abar_sqrt * a_first / (a_first - a_last)
    return abar_sqrt**2


@flax.struct.dataclass
class DiffusionSchedule:
    """Immutable schedule tables. A PYTREE (flax.struct) so guidance
    objects can be passed as jit arguments instead of being baked into
    compiled programs as constants."""

    alphas_cumprod: jnp.ndarray  # [T]
    num_train_timesteps: int = flax.struct.field(pytree_node=False, default=1000)
    prediction_type: str = flax.struct.field(
        pytree_node=False, default="v_prediction"
    )

    @classmethod
    def create(
        cls,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        rescale_betas_zero_snr: bool = True,
        prediction_type: str = "v_prediction",
    ) -> "DiffusionSchedule":
        if beta_schedule == "scaled_linear":
            betas = (
                np.linspace(
                    beta_start**0.5, beta_end**0.5, num_train_timesteps,
                    dtype=np.float64,
                )
                ** 2
            )
        elif beta_schedule == "linear":
            betas = np.linspace(
                beta_start, beta_end, num_train_timesteps, dtype=np.float64
            )
        elif beta_schedule == "squaredcos_cap_v2":
            # diffusers cosine schedule (DeepFloyd IF's DDPMScheduler)
            def abar(u):
                return np.cos((u + 0.008) / 1.008 * np.pi / 2) ** 2

            ts = np.arange(num_train_timesteps, dtype=np.float64)
            betas = np.minimum(
                1.0 - abar((ts + 1) / num_train_timesteps)
                / abar(ts / num_train_timesteps),
                0.999,
            )
        else:
            raise ValueError(f"unknown beta schedule {beta_schedule!r}")
        alphas_cumprod = np.cumprod(1.0 - betas)
        if rescale_betas_zero_snr:
            alphas_cumprod = _rescale_zero_terminal_snr(alphas_cumprod)
        return cls(
            alphas_cumprod=jnp.asarray(alphas_cumprod, jnp.float32),
            num_train_timesteps=num_train_timesteps,
            prediction_type=prediction_type,
        )

    # ---- noising -----------------------------------------------------
    def add_noise(self, x0, noise, t):
        """q(x_t | x_0): sqrt(abar) x0 + sqrt(1-abar) eps. t: [B] int."""
        abar = self.alphas_cumprod[t]
        shape = (-1,) + (1,) * (x0.ndim - 1)
        sa = jnp.sqrt(abar).reshape(shape)
        s1a = jnp.sqrt(1.0 - abar).reshape(shape)
        return sa * x0 + s1a * noise

    def get_velocity(self, x0, noise, t):
        """v-target: sqrt(abar) eps - sqrt(1-abar) x0."""
        abar = self.alphas_cumprod[t]
        shape = (-1,) + (1,) * (x0.ndim - 1)
        sa = jnp.sqrt(abar).reshape(shape)
        s1a = jnp.sqrt(1.0 - abar).reshape(shape)
        return sa * noise - s1a * x0

    def sds_weight(self, t, strategy: str = "sds"):
        """w(t) per dual_branch_guidance.py:399-407."""
        abar = self.alphas_cumprod[t]
        if strategy == "sds":
            return 1.0 - abar
        if strategy == "uniform":
            return jnp.ones_like(abar)
        if strategy == "fantasia3d":
            return jnp.sqrt(abar) * (1.0 - abar)
        raise ValueError(f"unknown weighting strategy {strategy!r}")

    # ---- model-output conversions ------------------------------------
    def pred_original(self, model_out, x_t, t):
        """x0-hat from a model output under this prediction type."""
        abar = self.alphas_cumprod[t]
        shape = (-1,) + (1,) * (x_t.ndim - 1)
        sa = jnp.sqrt(abar).reshape(shape)
        s1a = jnp.sqrt(1.0 - abar).reshape(shape)
        if self.prediction_type == "v_prediction":
            return sa * x_t - s1a * model_out
        if self.prediction_type == "epsilon":
            return (x_t - s1a * model_out) / sa
        raise ValueError(self.prediction_type)

    def pred_epsilon(self, model_out, x_t, t):
        """eps-hat from a model output under this prediction type."""
        abar = self.alphas_cumprod[t]
        shape = (-1,) + (1,) * (x_t.ndim - 1)
        sa = jnp.sqrt(abar).reshape(shape)
        s1a = jnp.sqrt(1.0 - abar).reshape(shape)
        if self.prediction_type == "v_prediction":
            return sa * model_out + s1a * x_t
        if self.prediction_type == "epsilon":
            return model_out
        raise ValueError(self.prediction_type)

    # ---- DDIM sampling ------------------------------------------------
    def trailing_timesteps(self, num_inference_steps: int) -> np.ndarray:
        """'trailing' spacing (descending), as the reference forces
        (dual_branch_guidance.py:169-175)."""
        step = self.num_train_timesteps / num_inference_steps
        ts = np.round(np.arange(self.num_train_timesteps, 0, -step)).astype(
            np.int64
        ) - 1
        return ts  # descending, starts at T-1

    def ddim_step(self, model_out, x_t, t, t_prev):
        """Deterministic DDIM update x_t -> x_{t_prev} (eta = 0)."""
        x0 = self.pred_original(model_out, x_t, t)
        eps = self.pred_epsilon(model_out, x_t, t)
        abar_prev = jnp.where(
            t_prev >= 0, self.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0
        )
        shape = (-1,) + (1,) * (x_t.ndim - 1)
        sa = jnp.sqrt(abar_prev).reshape(shape)
        s1a = jnp.sqrt(1.0 - abar_prev).reshape(shape)
        return sa * x0 + s1a * eps
