"""Standalone Stable-Diffusion SDS guidance (no depth branch).

TPU re-implementation of the reference's vanilla guidance
(/root/reference/threestudio/models/guidance/stable_diffusion_guidance.py),
the path selected by `texture_structure_joint: false` and the guidance
used by the stock threestudio systems (dreamfusion et al.):

- plain 2-way CFG SDS with the reference's text-as-base formula
  `e_text + s*(e_text - e_uncond)` (:248-251);
- Perp-Neg (:198-228): 4B batch [pos | uncond | neg1,neg2], negative
  scores projected perpendicular to the positive direction and summed
  with the view-dependent decay weights;
- weighting strategies sds/uniform/fantasia3d (:253-264);
- `rgb_as_latents` bypass, 512^2 VAE encode otherwise (:389-398);
- scalar grad clamp + the reparameterized SDS loss (:420-428).

The backbone is `SingleUNet` (guidance/unet.py) — the plain diffusers
UNet2DConditionModel, epsilon-prediction SD 2.1-base schedule (no
zero-SNR rescale, unlike the dual-branch's v-pred joint model).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from humangaussian_tpu.guidance.dual_branch import (
    VAE_SCALE,
    per_sample_normal,
    rescale_noise_cfg,
)
from humangaussian_tpu.guidance.vae import sample_latent
from humangaussian_tpu.guidance.prompt import (
    PromptEmbeddings,
    get_text_embeddings_perp_neg,
    perpendicular_component,
)
from humangaussian_tpu.guidance.schedule import DiffusionSchedule


def sd_eps_schedule(num_train_timesteps: int = 1000) -> DiffusionSchedule:
    """SD 2.1-base DDIM: scaled-linear betas, EPSILON prediction, no
    zero-SNR rescale (stable_diffusion_guidance.py:81-88 loads the
    checkpoint's stock scheduler)."""
    return DiffusionSchedule.create(
        num_train_timesteps=num_train_timesteps,
        rescale_betas_zero_snr=False,
        prediction_type="epsilon",
    )


@dataclasses.dataclass(frozen=True)
class SDGuidanceConfig:
    """Mirrors the used fields of stable_diffusion_guidance.py:21-50."""

    guidance_scale: float = 100.0
    weighting_strategy: str = "sds"
    guidance_rescale: float = 0.0
    view_dependent_prompting: bool = True
    use_perp_neg: bool = False
    latent_size: int = 64
    image_size: int = 512


@flax.struct.dataclass
class StableDiffusionGuidance:
    """Bundles modules+params; methods are jit-friendly pure functions.
    A PYTREE (flax.struct) like DualBranchGuidance, for the same
    don't-bake-gigabytes-as-constants reason."""

    unet: Any = flax.struct.field(pytree_node=False)  # SingleUNet module
    unet_params: Any = None
    vae: Any = flax.struct.field(pytree_node=False, default=None)
    vae_params: Any = None
    schedule: DiffusionSchedule = None
    cfg: SDGuidanceConfig = flax.struct.field(
        pytree_node=False, default=SDGuidanceConfig()
    )

    # ---- VAE transport (stable_diffusion_guidance.py:160-183) ---------
    def encode_images(self, imgs, rng, sample_idx=None):
        mean, logvar = self.vae.apply(
            self.vae_params, imgs * 2.0 - 1.0, method=self.vae.encode
        )
        if sample_idx is None:
            return sample_latent(mean, logvar, rng) * VAE_SCALE
        eps = per_sample_normal(rng, sample_idx, mean.shape, mean.dtype)
        return (mean + jnp.exp(0.5 * logvar) * eps) * VAE_SCALE

    def decode_latents(self, latents):
        img = self.vae.apply(
            self.vae_params, latents / VAE_SCALE, method=self.vae.decode
        )
        return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)

    def _unet_eps(self, lat_in, t_in, text):
        return self.unet.apply(self.unet_params, lat_in, t_in, text)

    # ---- SDS gradients -------------------------------------------------
    def compute_grad_sds(self, latents, t, text2, noise):
        """2-way CFG (stable_diffusion_guidance.py:229-276): text2 is
        [2B,L,D] = [cond | uncond]."""
        b = latents.shape[0]
        latents_noisy = self.schedule.add_noise(latents, noise, t)
        pred = self._unet_eps(
            jnp.tile(latents_noisy, (2, 1, 1, 1)), jnp.tile(t, (2,)), text2
        )
        e_text, e_uncond = jnp.split(pred, 2, axis=0)
        noise_pred = e_text + self.cfg.guidance_scale * (e_text - e_uncond)
        if self.cfg.guidance_rescale > 0.0:
            noise_pred = rescale_noise_cfg(
                noise_pred, e_text, self.cfg.guidance_rescale
            )
        w = self.schedule.sds_weight(t, self.cfg.weighting_strategy)
        return w.reshape(b, 1, 1, 1) * (noise_pred - noise)

    def compute_grad_sds_perp_neg(self, latents, t, text4, neg_weights,
                                  noise):
        """Perp-Neg 4-way batch (stable_diffusion_guidance.py:185-228):
        text4 = [pos | uncond | neg1,neg2 interleaved], weights [B,2]."""
        b = latents.shape[0]
        latents_noisy = self.schedule.add_noise(latents, noise, t)
        pred = self._unet_eps(
            jnp.tile(latents_noisy, (4, 1, 1, 1)), jnp.tile(t, (4,)), text4
        )
        e_text = pred[:b]
        e_uncond = pred[b : 2 * b]
        e_neg = pred[2 * b :]  # [2B] interleaved per camera
        e_pos = e_text - e_uncond
        accum = jnp.zeros_like(e_pos)
        for i in range(2):
            e_i = e_neg[i::2] - e_uncond
            accum = accum + neg_weights[:, i].reshape(
                b, 1, 1, 1
            ) * perpendicular_component(e_i, e_pos)
        noise_pred = e_uncond + self.cfg.guidance_scale * (e_pos + accum)
        w = self.schedule.sds_weight(t, self.cfg.weighting_strategy)
        return w.reshape(b, 1, 1, 1) * (noise_pred - noise)

    # ---- public step (stable_diffusion_guidance.py:374-451) -----------
    def __call__(
        self,
        rgb,  # [B,H,W,3] differentiable render
        embeddings: PromptEmbeddings,
        elevation,
        azimuth,
        t,  # [B] int timesteps
        rng,
        camera_distances=None,
        rgb_as_latents: bool = False,
        grad_clip_val=None,
        sample_idx=None,
    ):
        b = rgb.shape[0]
        if sample_idx is None:
            sample_idx = jnp.arange(b, dtype=jnp.int32)
        k_enc, k_noise = jax.random.split(rng)
        ls = self.cfg.latent_size
        if rgb_as_latents:
            latents = jax.image.resize(rgb, (b, ls, ls, 4), "bilinear")
        else:
            s = self.cfg.image_size
            img = jax.image.resize(rgb, (b, s, s, 3), "bilinear")
            encode = jax.checkpoint(
                lambda im, key: self.encode_images(im, key, sample_idx)
            )
            latents = encode(img, k_enc)

        noise = per_sample_normal(k_noise, sample_idx, latents.shape)
        lat_sg = jax.lax.stop_gradient(latents)
        if self.cfg.use_perp_neg:
            text4, neg_w = get_text_embeddings_perp_neg(
                embeddings, elevation, azimuth, camera_distances
            )
            grad = self.compute_grad_sds_perp_neg(
                lat_sg, t, text4, neg_w, noise
            )
        else:
            text3 = embeddings.get_text_embeddings(
                elevation, azimuth, camera_distances,
                self.cfg.view_dependent_prompting,
            )
            grad = self.compute_grad_sds(lat_sg, t, text3[: 2 * b], noise)

        grad = jnp.nan_to_num(grad)
        if grad_clip_val is not None:
            grad = jnp.clip(grad, -grad_clip_val, grad_clip_val)

        target = jax.lax.stop_gradient(latents - grad)
        loss_sds = 0.5 * jnp.sum((latents - target) ** 2) / b
        return {
            "loss_sds": loss_sds,
            "grad_norm": jnp.linalg.norm(grad),
            "grad": jax.lax.stop_gradient(grad),
        }
