"""Structure-Aware SDS guidance: ANPG / SDS gradients + reparam loss.

JAX re-implementation of the reference's dual-branch guidance object
(/root/reference/threestudio/models/guidance/dual_branch_guidance.py).
The heavy state (UNet/VAE modules + params + schedule) lives in a
`DualBranchGuidance` dataclass; the math is pure functions so the whole
guidance step jits into the training program.

Pipeline per step (reference __call__, :733-831):
  1. resize rgb & depth renders to 512^2, VAE-encode both; depth latents
     renormalized to the rgb latent statistics (:749-771, constants :22-27);
  2. encode the skeleton pose image -> `whole_latents`, renormalized, and
     channel-concat onto BOTH noisy latents as conditioning (:364-369);
  3. sample t ~ U[min_step, max_step] per batch element (:773-780);
  4. one batched UNet forward on 3B inputs ([cond | neg | null] text
     embeddings) -> ANPG gradient (:380-407):
       delta_c = s * (e_text - e_null)
       delta_d = t < 200 ? e_null : (e_null - e_neg)
       grad    = w(t) * (delta_c + delta_d),  w = 1 - alpha_bar_t
     with optional per-pixel norm clamp (:408-410);
  5. reparameterized SDS loss so autodiff carries `grad` into the
     renderer: 0.5*||latents - sg(latents - g_rgb)||^2_sum / B
     + lw_depth*||depth_latents - sg(... - g_depth)||^2_sum / B (:799-810).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from humangaussian_tpu.guidance.schedule import DiffusionSchedule
from humangaussian_tpu.guidance.vae import sample_latent

# latent-space normalization constants (dual_branch_guidance.py:22-27)
RGB_MEAN = 0.14654
RGB_STD = 1.03744
WHOLE_MEAN = -0.2481
WHOLE_STD = 1.45647
DEPTH_MEAN = 0.21360
DEPTH_STD = 1.20629


def rescale_noise_cfg(noise_cfg, noise_pred_text, guidance_rescale: float):
    """CFG std rescale, Lin et al. sec 3.4 (dual_branch_guidance.py:29-41)."""
    axes = tuple(range(1, noise_cfg.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True)
    rescaled = noise_cfg * (std_text / jnp.maximum(std_cfg, 1e-8))
    return guidance_rescale * rescaled + (1.0 - guidance_rescale) * noise_cfg

VAE_SCALE = 0.18215  # sd-vae-ft-mse scaling_factor


def per_sample_normal(key, sample_idx, shape, dtype=jnp.float32):
    """[b, ...] normal noise where row i depends only on (key,
    sample_idx[i]) — NOT on the batch shape. This makes every random
    draw invariant to how the camera batch is sharded across chips
    (dist/parallel.py), unlike jax.random.normal(key, (b, ...))."""
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(sample_idx)
    return jax.vmap(lambda k: jax.random.normal(k, shape[1:], dtype))(keys)


@dataclasses.dataclass(frozen=True)
class GuidanceConfig:
    """Mirrors the used fields of dual_branch_guidance.py:44-83."""

    guidance_scale: float = 100.0
    weighting_strategy: str = "sds"
    lw_depth: float = 0.5
    grad_clip_pixel: bool = True
    grad_clip_threshold: float = 1.0
    original_size: int = 1024
    target_size: int = 1024
    anpg_boundary_t: int = 200  # mask threshold in compute_grad_anpg:397
    mode: str = "anpg"  # "anpg" | "sds"
    guidance_rescale: float = 0.0
    latent_size: int = 64
    image_size: int = 512
    remat_encode: bool = True  # recompute VAE encoder in the backward:
    # saves ~1GB-class conv activations at 512^2 x batch for one extra
    # encoder forward (~45 ms at batch 8); turn off when HBM allows


@flax.struct.dataclass
class DualBranchGuidance:
    """Bundles modules+params; methods are jit-friendly pure functions.

    A PYTREE (flax.struct): the ~900M-param unet_params/vae_params leaves
    travel as jit ARGUMENTS — closing over them via `self` would bake
    gigabytes of constants into every compiled train step."""

    unet: Any = flax.struct.field(pytree_node=False)  # DualBranchUNet module
    unet_params: Any = None
    vae: Any = flax.struct.field(pytree_node=False, default=None)
    vae_params: Any = None
    schedule: DiffusionSchedule = None
    cfg: GuidanceConfig = flax.struct.field(
        pytree_node=False, default=GuidanceConfig()
    )

    # ---- VAE transport (dual_branch_guidance.py:237-249) --------------
    def encode_images(self, imgs, rng, sample_idx=None):
        """[B,H,W,3] in [0,1] -> sampled latents [B,h,w,4] * VAE_SCALE."""
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

    @property
    def branch_num(self) -> int:
        return getattr(self.unet.cfg, "branch_num", 1)

    # ---- UNet scoring --------------------------------------------------
    def _unet_eps(self, rgb_lat_in, depth_lat_in, t3, text_embeddings):
        """depth_lat_in: one [kB,h,w,8] array (branch_num=1) or a list of
        branch_num arrays (unet_rgbdepth.py:211-216,1102-1160). Returns
        [kB,h,w,4*(1+branch_num)] channel-concat predictions."""
        b3 = (
            depth_lat_in[0] if isinstance(depth_lat_in, (list, tuple))
            else rgb_lat_in
        ).shape[0]
        time_ids = jnp.tile(
            jnp.array(
                [[self.cfg.original_size, self.cfg.original_size, 0, 0,
                  self.cfg.target_size, self.cfg.target_size]],
                jnp.float32,
            ),
            (b3, 1),
        )
        out = self.unet.apply(
            self.unet_params, rgb_lat_in, depth_lat_in, t3, text_embeddings,
            time_ids,
        )  # [kB,h,w,4*(1+branch_num)]
        return out

    def compute_grad(self, latents, depth_latents, whole_latents, t,
                     text_embeddings, rng, sample_idx=None):
        """ANPG (or plain CFG-SDS) gradient for both branches.

        latents/depth_latents: [B,h,w,4]; whole_latents: [B,h,w,4];
        text_embeddings: [3B,L,D] in [cond | neg/uncond | null] order;
        t: [B] int. Returns grad [B,h,w,8].
        """
        depth_list = (
            list(depth_latents)
            if isinstance(depth_latents, (list, tuple))
            else [depth_latents]
        )
        nb = len(depth_list)
        b = latents.shape[0]
        k_noise, k_dnoise = jax.random.split(rng)
        # branch 0 keeps the historical k_dnoise stream (bit-identical
        # single-branch behavior); extra branches fold in their index
        dkeys = [
            k_dnoise if i == 0 else jax.random.fold_in(k_dnoise, i)
            for i in range(nb)
        ]
        if sample_idx is None:
            noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
            dnoises = [
                jax.random.normal(k, dl.shape, jnp.float32)
                for k, dl in zip(dkeys, depth_list)
            ]
        else:
            noise = per_sample_normal(k_noise, sample_idx, latents.shape)
            dnoises = [
                per_sample_normal(k, sample_idx, dl.shape)
                for k, dl in zip(dkeys, depth_list)
            ]
        latents_noisy = self.schedule.add_noise(latents, noise, t)
        depth_noisys = [
            self.schedule.add_noise(dl, dn, t)
            for dl, dn in zip(depth_list, dnoises)
        ]

        def unet_k(k, text):
            lat_in = jnp.concatenate(
                [jnp.tile(latents_noisy, (k, 1, 1, 1)),
                 jnp.tile(whole_latents, (k, 1, 1, 1))], axis=-1
            )
            dep_ins = [
                jnp.concatenate(
                    [jnp.tile(dn, (k, 1, 1, 1)),
                     jnp.tile(whole_latents, (k, 1, 1, 1))], axis=-1
                )
                for dn in depth_noisys
            ]
            dep_arg = dep_ins if nb > 1 else dep_ins[0]
            return self._unet_eps(lat_in, dep_arg, jnp.tile(t, (k,)), text)

        if self.cfg.mode == "anpg":
            # NFSD decomposition over a 3-way [cond|neg|null] batch
            # (compute_grad_anpg:371-397)
            pred = unet_k(3, text_embeddings)
            e_text, e_neg, e_null = jnp.split(pred, 3, axis=0)
            delta_c = self.cfg.guidance_scale * (e_text - e_null)
            mask = (t < self.cfg.anpg_boundary_t).astype(jnp.float32)
            mask = mask.reshape(b, 1, 1, 1)
            delta_d = mask * e_null + (1.0 - mask) * (e_null - e_neg)
            score = delta_c + delta_d
        elif self.cfg.mode == "sds":
            # reference compute_grad_sds: 2-way [cond|neg] batch
            # (text_embeddings[:2B], :508-509) and the quirky CFG with
            # the TEXT prediction as base term:
            #   noise_pred = e_text + s*(e_text - e_uncond)   (:543-545)
            pred = unet_k(2, text_embeddings[: 2 * b])
            e_text, e_uncond = jnp.split(pred, 2, axis=0)
            noise_pred = e_text + self.cfg.guidance_scale * (
                e_text - e_uncond
            )
            if self.cfg.guidance_rescale > 0.0:
                noise_pred = rescale_noise_cfg(
                    noise_pred, e_text, self.cfg.guidance_rescale
                )
            noise_all = jnp.concatenate([noise] + dnoises, axis=-1)
            score = noise_pred - noise_all
        else:
            raise ValueError(f"unknown guidance mode {self.cfg.mode!r}")

        w = self.schedule.sds_weight(t, self.cfg.weighting_strategy)
        grad = w.reshape(b, 1, 1, 1) * score
        if self.cfg.grad_clip_pixel:
            # per-pixel norm clamp over channels (:408-410)
            gnorm = jnp.linalg.norm(grad, axis=-1, keepdims=True) + 1e-8
            grad = (
                jnp.minimum(gnorm, self.cfg.grad_clip_threshold) * grad / gnorm
            )
        return jnp.nan_to_num(grad)

    def compute_grad_sjc(self, latents, depth_latents, whole_latents, t,
                         text_embeddings, rng, sample_idx=None,
                         var_red: bool = True):
        """Score-Jacobian-Chaining gradient (compute_grad_sjc:578-731):
        sigma = sqrt((1-abar)/abar), zs = y + sigma*eps, the UNet scores
        zs/sqrt(1+sigma^2) with 2-way CFG, Ds = zs - sigma*pred,
        grad = -(Ds - y)/sigma (variance-reduced form)."""
        b = latents.shape[0]
        if sample_idx is None:
            sample_idx = jnp.arange(b, dtype=jnp.int32)
        abar = self.schedule.alphas_cumprod[t]
        sigma = jnp.sqrt((1.0 - abar) / abar).reshape(b, 1, 1, 1)

        k_noise, k_dnoise = jax.random.split(rng)
        noise = per_sample_normal(k_noise, sample_idx, latents.shape)
        dnoise = per_sample_normal(k_dnoise, sample_idx, depth_latents.shape)
        zs = latents + sigma * noise
        dzs = depth_latents + sigma * dnoise
        scale = jnp.sqrt(1.0 + sigma**2)
        scaled, dscaled = zs / scale, dzs / scale

        # 2-way CFG over the [cond | neg] segments (the reference's SJC
        # path chunks its 3-segment embedding into 2 — we take the first
        # two segments explicitly)
        text2 = text_embeddings[: 2 * b]
        lat_in = jnp.concatenate(
            [jnp.tile(scaled, (2, 1, 1, 1)),
             jnp.tile(whole_latents, (2, 1, 1, 1))], axis=-1
        )
        dep_in = jnp.concatenate(
            [jnp.tile(dscaled, (2, 1, 1, 1)),
             jnp.tile(whole_latents, (2, 1, 1, 1))], axis=-1
        )
        pred = self._unet_eps(lat_in, dep_in, jnp.tile(t, (2,)), text2)
        e_text, e_uncond = jnp.split(pred, 2, axis=0)
        noise_pred = e_text + self.cfg.guidance_scale * (e_text - e_uncond)
        if self.cfg.guidance_rescale > 0.0:
            noise_pred = rescale_noise_cfg(
                noise_pred, e_text, self.cfg.guidance_rescale
            )
        zs_all = jnp.concatenate([zs, dzs], axis=-1)
        y_all = jnp.concatenate([latents, depth_latents], axis=-1)
        sigma2 = jnp.concatenate([jnp.broadcast_to(sigma, zs.shape)] * 2, -1)
        ds = zs_all - sigma2 * noise_pred
        ref = y_all if var_red else zs_all
        return jnp.nan_to_num(-(ds - ref) / sigma2)

    # ---- eval rollout (guidance_eval, :934-1050) -----------------------
    def denoise_pred(self, latents_noisy, depth_noisy, whole_latents, t,
                     text2):
        """2-way CFG model output for both branches (get_noise_pred)."""
        b = latents_noisy.shape[0]
        lat_in = jnp.concatenate(
            [jnp.tile(latents_noisy, (2, 1, 1, 1)),
             jnp.tile(whole_latents, (2, 1, 1, 1))], axis=-1
        )
        dep_in = jnp.concatenate(
            [jnp.tile(depth_noisy, (2, 1, 1, 1)),
             jnp.tile(whole_latents, (2, 1, 1, 1))], axis=-1
        )
        pred = self._unet_eps(lat_in, dep_in, jnp.tile(t, (2,)), text2)
        e_text, e_uncond = jnp.split(pred, 2, axis=0)
        out = e_text + self.cfg.guidance_scale * (e_text - e_uncond)
        if self.cfg.guidance_rescale > 0.0:
            out = rescale_noise_cfg(out, e_text, self.cfg.guidance_rescale)
        return out

    def guidance_eval(self, latents_noisy, depth_noisy, whole_latents,
                      t_start, text2, num_steps: int = 50):
        """50-step DDIM rollout from the current noise level; returns the
        1-step x0 estimate and the fully-denoised images for both
        branches (the reference's training-visualization strips)."""
        ts = self.schedule.trailing_timesteps(num_steps)
        sched = self.schedule

        pred0 = self.denoise_pred(
            latents_noisy, depth_noisy, whole_latents, t_start, text2
        )
        x0_rgb = sched.pred_original(pred0[..., :4], latents_noisy, t_start)
        x0_depth = sched.pred_original(pred0[..., 4:], depth_noisy, t_start)

        lat, dep = latents_noisy, depth_noisy
        for i, t_i in enumerate(ts):
            t_prev = ts[i + 1] if i + 1 < len(ts) else -1
            t_arr = jnp.full(t_start.shape, t_i, jnp.int32)
            active = (t_i <= t_start).reshape((-1,) + (1,) * 3)
            pred = self.denoise_pred(lat, dep, whole_latents, t_arr, text2)
            lat_next = sched.ddim_step(
                pred[..., :4], lat, t_arr, jnp.full_like(t_arr, t_prev)
            )
            dep_next = sched.ddim_step(
                pred[..., 4:], dep, t_arr, jnp.full_like(t_arr, t_prev)
            )
            lat = jnp.where(active, lat_next, lat)
            dep = jnp.where(active, dep_next, dep)

        def undepth(z):  # invert the depth-latent renormalization
            return (z - RGB_MEAN) / RGB_STD * DEPTH_STD + DEPTH_MEAN

        return {
            "imgs_1step": self.decode_latents(x0_rgb),
            "depths_1step": self.decode_latents(undepth(x0_depth)),
            "imgs_final": self.decode_latents(lat),
            "depths_final": self.decode_latents(undepth(dep)),
        }

    def sample_joint(self, pose_image, text2, rng, num_steps: int = 50):
        """Full text->(image, depth) inference sampling, the counterpart
        of the reference's StableDiffusionPipeline for the dual-branch
        model (models/pipeline_rgbdepth.py:811-872): joint DDIM denoising
        of rgb and depth latents from pure noise, both conditioned on the
        pose image; depth latents un-normalized before decoding.

        pose_image: [B,H,W,3] in [0,1]; text2: [2B,L,D] = [cond | neg].
        Returns (images [B,H,W,3], depths [B,H,W,3]) in [0,1].
        """
        b = pose_image.shape[0]
        s = self.cfg.image_size
        lat = self.cfg.latent_size
        k_pose, k_lat, k_dep = jax.random.split(rng, 3)
        pose = jax.image.resize(pose_image, (b, s, s, 3), "bilinear")
        whole_latents = self.encode_images(pose, k_pose)
        whole_latents = (
            (whole_latents - WHOLE_MEAN) / WHOLE_STD * RGB_STD + RGB_MEAN
        )
        shape = (b, lat, lat, 4)
        latents = jax.random.normal(k_lat, shape, jnp.float32)
        depth_latents = jax.random.normal(k_dep, shape, jnp.float32)

        ts = self.schedule.trailing_timesteps(num_steps)
        for i, t_i in enumerate(ts):
            t_prev = ts[i + 1] if i + 1 < len(ts) else -1
            t_arr = jnp.full((b,), t_i, jnp.int32)
            pred = self.denoise_pred(
                latents, depth_latents, whole_latents, t_arr, text2
            )
            latents = self.schedule.ddim_step(
                pred[..., :4], latents, t_arr, jnp.full_like(t_arr, t_prev)
            )
            depth_latents = self.schedule.ddim_step(
                pred[..., 4:], depth_latents, t_arr,
                jnp.full_like(t_arr, t_prev),
            )

        depth_out = (
            (depth_latents - RGB_MEAN) / RGB_STD * DEPTH_STD + DEPTH_MEAN
        )
        return (
            self.decode_latents(latents),
            self.decode_latents(depth_out),
        )

    # ---- the public step ----------------------------------------------
    def __call__(
        self,
        pose_image,  # [B,H,W,3] skeleton conditioning render
        rgb,  # [B,H,W,3] differentiable render
        depth,  # [B,H,W,3] normalized structure image (3-channel), or a
        #     list of branch_num structure images when the UNet was built
        #     with branch_num > 1 (unet_rgbdepth.py:211-216)
        text_embeddings,  # [3B,L,D] = [cond | neg | null]
        t,  # [B] int timesteps
        rng,
        grad_clip_val=None,
        sample_idx=None,  # [B] global sample ids -> shard-invariant noise
        elevation=None,  # accepted for guidance-protocol uniformity:
        azimuth=None,  # the dual-branch pipeline takes its view
        camera_distances=None,  # dependence pre-baked into text_embeddings
        #     (the system selects [cond|neg|null] per camera), matching
        #     the reference dual_branch_guidance.py which never consumes
        #     raw angles; Perp-Neg consumers (deep-floyd/SD) use them
    ):
        depths = list(depth) if isinstance(depth, (list, tuple)) else [depth]
        nb = self.branch_num
        if len(depths) != nb:
            raise ValueError(
                f"got {len(depths)} structure images for a branch_num="
                f"{nb} UNet"
            )
        if self.cfg.mode == "sjc" and nb != 1:
            raise NotImplementedError("SJC guidance is single-branch")
        b = rgb.shape[0]
        s = self.cfg.image_size
        k_rgb, k_depth, k_pose, k_grad = jax.random.split(rng, 4)
        if sample_idx is None:
            sample_idx = jnp.arange(b, dtype=jnp.int32)

        def resize(x):
            return jax.image.resize(x, (b, s, s, 3), "bilinear")

        # remat the VAE encodes (cfg.remat_encode): their conv
        # activations at 512^2 x batch dominate backward HBM (1GB-class
        # temps); recomputing the encoder in the backward trades one
        # extra encoder forward for gigabytes
        encode = lambda img, key: self.encode_images(img, key, sample_idx)
        if self.cfg.remat_encode:
            encode = jax.checkpoint(encode)
        latents = encode(resize(rgb), k_rgb)
        depth_latents = [
            (encode(
                resize(d),
                k_depth if i == 0 else jax.random.fold_in(k_depth, i),
            ) - DEPTH_MEAN) / DEPTH_STD * RGB_STD + RGB_MEAN
            for i, d in enumerate(depths)
        ]
        whole_latents = self.encode_images(resize(pose_image), k_pose, sample_idx)
        whole_latents = (
            (whole_latents - WHOLE_MEAN) / WHOLE_STD * RGB_STD + RGB_MEAN
        )
        whole_latents = jax.lax.stop_gradient(whole_latents)

        grad_fn = (
            self.compute_grad_sjc if self.cfg.mode == "sjc" else self.compute_grad
        )
        grad = grad_fn(
            jax.lax.stop_gradient(latents),
            jax.lax.stop_gradient(depth_latents[0]) if nb == 1
            else [jax.lax.stop_gradient(d) for d in depth_latents],
            whole_latents,
            t,
            text_embeddings,
            k_grad,
            sample_idx,
        )
        if grad_clip_val is not None:
            grad = jnp.clip(grad, -grad_clip_val, grad_clip_val)
        g_rgb = grad[..., :4]

        # reparameterized SDS loss (:799-810), one lw_depth term per
        # structure branch
        target = jax.lax.stop_gradient(latents - g_rgb)
        loss_sds = 0.5 * jnp.sum((latents - target) ** 2) / b
        for i, dl in enumerate(depth_latents):
            g_d = grad[..., 4 * (i + 1) : 4 * (i + 2)]
            d_target = jax.lax.stop_gradient(dl - g_d)
            loss_sds = loss_sds + self.cfg.lw_depth * jnp.sum(
                (dl - d_target) ** 2
            ) / b
        return {
            "loss_sds": loss_sds,
            "grad_norm": jnp.linalg.norm(grad),
            "grad": jax.lax.stop_gradient(grad),
        }


def sample_timesteps(rng, batch, min_step: int, max_step: int):
    """t ~ U[min_step, max_step] inclusive (dual_branch_guidance.py:773-780)."""
    return jax.random.randint(rng, (batch,), min_step, max_step + 1)


def min_max_steps(
    num_train_timesteps: int, min_percent: float, max_percent: float
):
    """set_min_max_steps (dual_branch_guidance.py:196-199); the system
    anneals max 0.98 -> 0.5 after step 1500 (GaussianDreamer.py:320-321)."""
    return (
        int(num_train_timesteps * min_percent),
        int(num_train_timesteps * max_percent),
    )
