"""Vanilla photo-supervised 3DGS trainer (L1 + D-SSIM).

TPU-native re-design of the reference's INRIA training loop
(/root/reference/gaussiansplatting/train.py:31-129): per step, render
one (or a batch of) posed training image(s), minimize
(1-lambda)*L1 + lambda*(1-SSIM), run adaptive density control
(densify 500..15000 every 100, opacity reset every 3000, SH degree
bumped every 1000 — train.py:73-75,105-117), all on the padded
recompile-free scene.

reset_opacity follows gaussian_model.py:219-223: opacity <- logit(
min(opacity, 0.01)) with the opacity Adam moments zeroed
(replace_tensor_to_optimizer).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.core.camera import Camera, camera_from_c2w
from humangaussian_tpu.core.scene import (
    GaussianScene,
    inverse_sigmoid,
    scene_from_points,
)
from humangaussian_tpu.densify import (
    DensifyState,
    densify_and_prune,
    init_densify_state,
    update_stats,
)
from humangaussian_tpu.losses import photometric_loss, psnr, ssim
from humangaussian_tpu.ops.knn import mean_3nn_sq_dist_host
from humangaussian_tpu.ops.projection import RasterizeConfig
from humangaussian_tpu.ops.rasterize_tiled import rasterize_tiled
from humangaussian_tpu.train.optim import (
    AdamState,
    GaussianOptimConfig,
    adam_init,
    adam_step,
)


@dataclasses.dataclass(frozen=True)
class PhotoTrainConfig:
    """OptimizationParams defaults (arguments/__init__.py:70-88)."""

    capacity: int = 1 << 19
    sh_degree: int = 3
    iterations: int = 30_000
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    min_opacity: float = 0.005
    size_threshold: float = 20.0
    white_background: bool = False
    tile_capacity: int = 4096
    oneup_sh_interval: int = 1000


class PhotoTrainState(NamedTuple):
    scene: GaussianScene
    adam: AdamState
    densify: DensifyState
    step: jnp.ndarray
    key: jax.Array
    active_sh_degree: jnp.ndarray  # [] int32


class PhotoTrainer:
    def __init__(
        self,
        cfg: PhotoTrainConfig,
        extent: float,
        optim_cfg: GaussianOptimConfig | None = None,
        raster_cfg: RasterizeConfig = RasterizeConfig(),
    ):
        self.cfg = cfg
        self.extent = float(extent)
        self.optim_cfg = optim_cfg or GaussianOptimConfig(
            spatial_lr_scale=float(extent)
        )
        self.raster_cfg = raster_cfg
        self.background = (
            jnp.ones((3,), jnp.float32)
            if cfg.white_background
            else jnp.zeros((3,), jnp.float32)
        )

    def init_state(
        self, key: jax.Array, points: np.ndarray, colors: np.ndarray
    ) -> PhotoTrainState:
        mean_sq = mean_3nn_sq_dist_host(points)
        scene = scene_from_points(
            jnp.asarray(points),
            jnp.asarray(colors),
            capacity=self.cfg.capacity,
            sh_degree=self.cfg.sh_degree,
            mean_sq_dist=mean_sq,
        )
        return PhotoTrainState(
            scene=scene,
            adam=adam_init(scene.params()),
            densify=init_densify_state(self.cfg.capacity),
            step=jnp.zeros((), jnp.int32),
            key=key,
            active_sh_degree=jnp.zeros((), jnp.int32),
        )

    def render(self, scene: GaussianScene, camera: Camera,
               active_sh_degree=None, background=None):
        # NOTE: active SH degree must be static for compilation; the
        # training step renders at max degree with lower-degree bands
        # still zero-initialized, which is numerically identical to the
        # reference's progressive activation once bands start at 0.
        return rasterize_tiled(
            scene.means, scene.scales, scene.quats, scene.features,
            scene.opacities, scene.alive, camera,
            self.background if background is None else background,
            scene.max_sh_degree if active_sh_degree is None else active_sh_degree,
            self.raster_cfg, tile_capacity=self.cfg.tile_capacity,
        )

    @functools.partial(jax.jit, static_argnums=(0, 3, 4))
    def _train_step_impl(self, state: PhotoTrainState, c2w, fovy: float,
                         hw: tuple, gt):
        cfg = self.cfg
        camera = camera_from_c2w(c2w, fovy, hw[0], hw[1])
        params = state.scene.params()
        offset = jnp.zeros((cfg.capacity, 2), jnp.float32)

        def loss_fn(params, offset):
            scene = state.scene.replace_params(params)
            out = rasterize_tiled(
                scene.means, scene.scales, scene.quats, scene.features,
                scene.opacities, scene.alive, camera, self.background,
                scene.max_sh_degree, self.raster_cfg,
                means2d_offset=offset, tile_capacity=cfg.tile_capacity,
            )
            loss = photometric_loss(out["image"], gt, cfg.lambda_dssim)
            return loss, out["radii"]

        (loss, radii), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, offset)
        param_grads, means2d_grad = grads
        densify = update_stats(state.densify, means2d_grad, radii, radii > 0)
        lrs = self.optim_cfg.group_lrs(state.step)
        new_params, adam = adam_step(
            params, param_grads, state.adam, lrs, self.optim_cfg
        )
        return (
            PhotoTrainState(
                scene=state.scene.replace_params(new_params),
                adam=adam,
                densify=densify,
                step=state.step + 1,
                key=state.key,
                active_sh_degree=state.active_sh_degree,
            ),
            {"loss": loss, "n_alive": state.scene.num_alive},
        )

    def train_step(self, state: PhotoTrainState, posed) -> tuple:
        return self._train_step_impl(
            state,
            jnp.asarray(posed.c2w),
            float(posed.fovy),
            posed.image.shape[:2],
            jnp.asarray(posed.image),
        )

    # ---- density control schedule (train.py:105-117) ------------------
    @functools.partial(jax.jit, static_argnums=(0, 2))
    def densify_step(self, state: PhotoTrainState, use_size_threshold: bool):
        cfg = self.cfg
        key, k_split = jax.random.split(state.key)
        moments = {"mu": state.adam.mu, "nu": state.adam.nu}
        scene, moments, ds, info = densify_and_prune(
            state.scene, moments, state.densify, k_split,
            max_grad=cfg.densify_grad_threshold,
            min_opacity=cfg.min_opacity,
            extent=self.extent,
            max_screen_size=cfg.size_threshold if use_size_threshold else None,
        )
        adam = AdamState(mu=moments["mu"], nu=moments["nu"], count=state.adam.count)
        return (
            state._replace(scene=scene, adam=adam, densify=ds, key=key),
            info,
        )

    @functools.partial(jax.jit, static_argnums=(0,))
    def reset_opacity(self, state: PhotoTrainState) -> PhotoTrainState:
        """opacity <- logit(min(opacity, 0.01)), moments zeroed
        (gaussian_model.py:219-223)."""
        scene = state.scene
        new_logits = inverse_sigmoid(
            jnp.minimum(jax.nn.sigmoid(scene.opacity_logits), 0.01)
        )
        new_logits = jnp.where(scene.alive[:, None], new_logits, -10.0)
        mu = dict(state.adam.mu)
        nu = dict(state.adam.nu)
        mu["opacity_logits"] = jnp.zeros_like(mu["opacity_logits"])
        nu["opacity_logits"] = jnp.zeros_like(nu["opacity_logits"])
        return state._replace(
            scene=scene._replace(opacity_logits=new_logits),
            adam=AdamState(mu=mu, nu=nu, count=state.adam.count),
        )

    def maybe_density_control(self, state: PhotoTrainState):
        step = int(state.step)
        cfg = self.cfg
        info = None
        if step < cfg.densify_until_iter:
            if (
                step > cfg.densify_from_iter
                and step % cfg.densification_interval == 0
            ):
                use_st = step > cfg.opacity_reset_interval
                state, info = self.densify_step(state, use_st)
            if step % cfg.opacity_reset_interval == 0 or (
                cfg.white_background and step == cfg.densify_from_iter
            ):
                state = self.reset_opacity(state)
        if step % cfg.oneup_sh_interval == 0:
            state = state._replace(
                active_sh_degree=jnp.minimum(
                    state.active_sh_degree + 1, self.cfg.sh_degree
                )
            )
        return state, info

    # ---- eval ---------------------------------------------------------
    def evaluate(self, scene: GaussianScene, posed_images: list) -> dict:
        """PSNR/SSIM over a split (metrics.py protocol)."""
        psnrs, ssims = [], []
        for p in posed_images:
            camera = camera_from_c2w(
                jnp.asarray(p.c2w), float(p.fovy), *p.image.shape[:2]
            )
            out = self.render(scene, camera)
            gt = jnp.asarray(p.image)
            psnrs.append(float(psnr(out["image"], gt)))
            ssims.append(float(ssim(out["image"], gt)))
        return {
            "psnr": float(np.mean(psnrs)),
            "ssim": float(np.mean(ssims)),
        }


def train_photo(
    trainer: PhotoTrainer,
    state: PhotoTrainState,
    dataset,
    iterations: int | None = None,
    rng: np.random.Generator | None = None,
    log_every: int = 100,
    log_fn=print,
):
    """Host loop: random camera per step + density-control schedule."""
    rng = rng or np.random.default_rng(0)
    iterations = iterations or trainer.cfg.iterations
    for _ in range(int(state.step), iterations):
        posed = dataset.train[int(rng.integers(len(dataset.train)))]
        state, metrics = trainer.train_step(state, posed)
        state, _ = trainer.maybe_density_control(state)
        step = int(state.step)
        if step % log_every == 0:
            log_fn(
                f"photo step {step}: loss={float(metrics['loss']):.4f} "
                f"alive={int(metrics['n_alive'])}"
            )
    return state
