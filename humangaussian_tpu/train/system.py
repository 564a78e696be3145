"""GaussianDreamer training system: one jitted step, batched over cameras.

TPU-first re-design of the reference system
(/root/reference/threestudio/systems/GaussianDreamer.py). Where the
reference renders its 8 cameras in a sequential Python loop and taps
screen-space gradients through retained-grad tensors (:244,378-391), here
the whole step is ONE compiled program:

  sample cameras (pure PRNG)  -> vmapped tiled render (+ pose images)
  -> dual-branch ANPG guidance -> loss -> grad(scene params, means2d)
  -> per-group Adam            -> densification stat update

Camera-batch gradient accumulation falls out of sharing one means2d
offset tensor across the vmapped cameras (its gradient is the sum over
the batch — exactly the reference's summed viewspace grads, :384-391).

Densify/prune runs as a separate jitted function on the reference's
schedule (clone+split 300..2100 step 300; prune-only 2400..3300 step
300; GaussianDreamer.py:393-408 + configs/test.yaml:41-51), driven by the
host loop — shapes are static so there is exactly one compilation of
each program.

Reference quirks preserved: "opacity" is globally max-normalized depth
(:302); depth for guidance is per-image min-max normalized then repeated
to 3 channels (:330-333); timestep range anneals to [0.02, 0.55] after
step 1500 (:320-321); sparsity loss sqrt(o^2+0.01) and self-BCE opaque
loss (:360-366).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.core.camera import camera_from_c2w
from humangaussian_tpu.core.scene import GaussianScene, scene_from_points
from humangaussian_tpu.data.cameras import (
    CameraBatch,
    RandomCameraConfig,
    eval_camera_batch,
    sample_camera_batch,
)
from humangaussian_tpu.densify import (
    DensifyState,
    densify_and_prune,
    init_densify_state,
    prune_only,
    update_stats,
)
from humangaussian_tpu.guidance.dual_branch import sample_timesteps
from humangaussian_tpu.ops.knn import mean_3nn_sq_dist_host
from humangaussian_tpu.ops.projection import RasterizeConfig
from humangaussian_tpu.ops.rasterize_tiled import rasterize_tiled, rasterize_tiled_batch
from humangaussian_tpu.smplx.pose_image import (
    draw_humansd_pose,
    draw_openpose_pose,
)
from humangaussian_tpu.train.optim import (
    AdamState,
    GaussianOptimConfig,
    adam_init,
    adam_step,
)
from humangaussian_tpu.utils.schedules import C_schedule


@dataclasses.dataclass(frozen=True)
class GaussianDreamerConfig:
    """Mirror of GaussianDreamer.Config (:79-103) + test.yaml:34-96."""

    capacity: int = 1 << 19  # static Gaussian slot count (init 100k)
    pts_num: int = 100_000
    sh_degree: int = 0
    bg_white: bool = False
    apose: bool = True
    texture_structure_joint: bool = True
    disable_hand_densification: bool = False
    hand_radius: float = 0.05
    cameras_extent: float = 4.0
    # densify/prune schedule (test.yaml:41-51)
    densify_prune_start_step: int = 300
    densify_prune_end_step: int = 2100
    densify_prune_interval: int = 300
    size_threshold: float = 20.0
    size_threshold_fix_step: int = 1500
    max_grad: float = 0.0002
    prune_only_start_step: int = 2400
    prune_only_end_step: int = 3300
    prune_only_interval: int = 300
    prune_size_threshold: float = 0.008
    min_opacity: float = 0.05
    # timestep annealing (:320-321) and loss weights (test.yaml:88-91)
    half_scheduler_max_step: int = 1500
    min_step_percent: float = 0.02
    max_step_percent: float = 0.98
    max_step_percent_annealed: float = 0.55
    lambda_sds: Any = 1.0
    lambda_sparsity: Any = 1.0
    lambda_opaque: Any = 0.0
    grad_clip: Any = (0, 1.5, 2.0, 1000)  # C() schedule (test.yaml:70)
    pose_image_size: int = 512
    max_steps: int = 3600
    tile_capacity: int = 4096
    # remat of the batched render traded a forward replay (projection +
    # binning sorts + pair gathers, all index-cost-heavy) for residual
    # HBM. With the backward's lane-padded residents gone (rasterize
    # _tiled feature-major refactor) the residuals fit comfortably and
    # the replay is pure loss: measured 1.40 -> 1.15 s/step at 340k
    # alive, 0.854 -> 0.836 s at 100k (probe_train_scale.py). Keep True
    # only for HBM-constrained giant scenes.
    remat_render: bool = False


class TrainState(NamedTuple):
    scene: GaussianScene
    adam: AdamState
    densify: DensifyState
    step: jnp.ndarray  # [] int32
    key: jax.Array


class GaussianDreamerSystem:
    """Owns static config + host-side assets; methods are jit-compiled."""

    def __init__(
        self,
        cfg: GaussianDreamerConfig,
        skeleton,  # smplx.skeleton.Skeleton, already loaded+scaled(-10)
        guidance=None,  # guidance.dual_branch.DualBranchGuidance or None
        prompt_embeddings=None,  # guidance.prompt.PromptEmbeddings
        camera_cfg: RandomCameraConfig = RandomCameraConfig(),
        optim_cfg: GaussianOptimConfig = GaussianOptimConfig(),
        raster_cfg: RasterizeConfig = RasterizeConfig(),
    ):
        self.cfg = cfg
        self.skeleton = skeleton
        self.guidance = guidance
        self.prompt_embeddings = prompt_embeddings
        self.camera_cfg = camera_cfg
        self.optim_cfg = optim_cfg
        self.raster_cfg = raster_cfg
        self.background = (
            jnp.ones((3,), jnp.float32)
            if cfg.bg_white
            else jnp.zeros((3,), jnp.float32)
        )
        self.pose_points = jnp.asarray(skeleton.points3d)
        self.hand_centers = jnp.asarray(skeleton.hand_centers)

    # ---- init ---------------------------------------------------------
    def init_state(self, key: jax.Array, seed: int = 0) -> TrainState:
        """Sample the SMPL-X surface and build the padded scene
        (GaussianDreamer.pcb :220-232 + create_from_pcd)."""
        pts = self.skeleton.sample_smplx_points(self.cfg.pts_num, seed=seed)
        colors = np.full((pts.shape[0], 3), 0.5, np.float32)  # gray 0.5
        mean_sq = mean_3nn_sq_dist_host(pts)
        scene = scene_from_points(
            jnp.asarray(pts),
            jnp.asarray(colors),
            capacity=self.cfg.capacity,
            sh_degree=self.cfg.sh_degree,
            mean_sq_dist=mean_sq,
        )
        return TrainState(
            scene=scene,
            adam=adam_init(scene.params()),
            densify=init_densify_state(self.cfg.capacity),
            step=jnp.zeros((), jnp.int32),
            key=key,
        )

    # ---- rendering ----------------------------------------------------
    def render_batch(self, scene: GaussianScene, cameras: CameraBatch,
                     height: int, width: int, background=None,
                     means2d_offset=None, active_cap=None, raster_cfg=None,
                     tile_cap=None, class_fracs="cfg"):
        """vmapped tiled render over the camera batch. Returns dict of
        stacked images plus radii [B, C].

        `class_fracs` ("cfg" = keep the config's value) overrides the
        candidate-domain class split — train/loop.py grows it on a
        ladder when dense-phase class-spill overflow persists (a
        mid-training scene whose (2,2)-class population exceeds its
        static cap loses the spilled splats' right/bottom tiles;
        ops/binning.py demoted_lost)."""
        bg = self.background if background is None else background
        rcfg = self.raster_cfg if raster_cfg is None else raster_cfg
        if class_fracs != "cfg":
            rcfg = dataclasses.replace(rcfg, class_fracs=class_fracs)
        if means2d_offset is None:
            means2d_offset = jnp.zeros((scene.capacity, 2), jnp.float32)

        def render_all(means, scales, quats, feats, opas, off):
            cams = jax.vmap(
                lambda c2w, fovy: camera_from_c2w(c2w, fovy, height, width)
            )(cameras.c2w, cameras.fovy)
            return rasterize_tiled_batch(
                means, scales, quats, feats, opas, scene.alive, cams, bg,
                self.cfg.sh_degree, rcfg, means2d_offset=off,
                tile_capacity=tile_cap or self.cfg.tile_capacity,
                active_cap=active_cap,
            )

        if self.cfg.remat_render:
            # keeps the batched backward within HBM: without remat the
            # backward holds every camera's compacted pair array live
            # simultaneously
            render_all = jax.checkpoint(render_all)
        return render_all(
            scene.means, scene.scales, scene.quats, scene.features,
            scene.opacities, means2d_offset,
        )

    def pose_images(self, cameras: CameraBatch):
        """Skeleton conditioning images, back-view occlusion beyond 120
        degrees azimuth (GaussianDreamer.py:269-282)."""
        size = self.cfg.pose_image_size
        draw = (
            draw_humansd_pose
            if self.cfg.texture_structure_joint
            else draw_openpose_pose
        )

        def one(mvp, azimuth):
            backview = jnp.abs(azimuth) > 120.0
            img, _kp = draw(self.pose_points, mvp, size, size, backview)
            return img

        return jax.vmap(one)(cameras.mvp_mtx, cameras.azimuth)

    # ---- loss (shard-aware: global reductions become collectives) -----
    def batch_loss(
        self, params, offset, scene_template, cameras, pose, text3, t,
        key, step, axis_name=None, n_shards=1, global_batch=None,
        sample_idx=None, guidance=None, active_cap=None, tile_cap=None,
        class_fracs="cfg",
    ):
        """Loss over a (shard of the) camera batch.

        `text3` is [3, b, L, D] ([cond|neg|null] stacked on axis 0 so a
        batch shard keeps all three CFG segments). When running under
        shard_map, `axis_name` makes the reference's GLOBAL depth max
        (:302) a cross-shard pmax, the SDS sum normalizes by the global
        batch, and mean losses are divided by n_shards so the psum of
        shard gradients equals the single-device gradient.
        """
        cfg = self.cfg
        scene = scene_template.replace_params(params)
        out = self.render_batch(
            scene, cameras, self.camera_cfg.height, self.camera_cfg.width,
            means2d_offset=offset, active_cap=active_cap, tile_cap=tile_cap,
            class_fracs=class_fracs,
        )
        images = out["image"]  # [b,H,W,3]
        depths = out["depth"][..., None]  # [b,H,W,1]
        local_b = images.shape[0]
        global_batch = global_batch or local_b

        # "opacity" = globally max-normalized depth (:302). The max is a
        # normalization constant: stop-grad (torch routes a measure-zero
        # gradient through the argmax pixel; pmax has no VJP anyway).
        depth_max = jax.lax.stop_gradient(jnp.max(depths))
        if axis_name is not None:
            depth_max = jax.lax.pmax(depth_max, axis_name)
        opacity = depths / (depth_max + 1e-5)
        # guidance depth: per-image min-max -> 3 channels (:330-333)
        dmin = jnp.min(depths, axis=(1, 2, 3), keepdims=True)
        dmax = jnp.max(depths, axis=(1, 2, 3), keepdims=True)
        depth3 = jnp.repeat((depths - dmin) / (dmax - dmin + 1e-10), 3, axis=-1)

        if guidance is None:
            guidance = self.guidance
        text = text3.reshape((-1,) + text3.shape[2:])  # [3b, L, D]
        g_out = guidance(
            pose, images, depth3, text, t, key,
            grad_clip_val=C_schedule(cfg.grad_clip, step),
            sample_idx=sample_idx,
            # raw camera angles ride along for guidances that rebuild
            # their own CFG layout per camera (Perp-Neg on the
            # deep-floyd path); the dual-branch guidance ignores them
            elevation=cameras.elevation,
            azimuth=cameras.azimuth,
            camera_distances=cameras.camera_distances,
        )
        # guidance divides its sum-loss by local b; renormalize to global
        loss_sds = g_out["loss_sds"] * (local_b / global_batch)
        loss = loss_sds * C_schedule(cfg.lambda_sds, step)
        loss_sparsity = jnp.mean(jnp.sqrt(opacity**2 + 0.01)) / n_shards
        loss = loss + loss_sparsity * C_schedule(cfg.lambda_sparsity, step)
        oc = jnp.clip(opacity, 1e-3, 1.0 - 1e-3)
        loss_opaque = (
            jnp.mean(-(oc * jnp.log(oc) + (1 - oc) * jnp.log(1 - oc))) / n_shards
        )
        loss = loss + loss_opaque * C_schedule(cfg.lambda_opaque, step)

        radii_max = jnp.max(out["radii"], axis=0)  # max over local cameras
        aux = {
            "radii": radii_max,
            "loss_sds": loss_sds,
            "loss_sparsity": loss_sparsity,
            "loss_opaque": loss_opaque,
            "grad_norm": g_out["grad_norm"],
            "overflow": jnp.max(out["overflow"]),
            "overflow_spill": jnp.max(out["overflow_spill"]),
        }
        return loss, aux

    def sample_step_inputs(self, state: TrainState):
        """Per-step host-free input sampling (cameras, pose, text, t)."""
        cfg = self.cfg
        key, k_cam, k_t, k_guid = jax.random.split(state.key, 4)
        step = state.step
        cameras = sample_camera_batch(k_cam, step, self.camera_cfg)
        pose = self.pose_images(cameras)

        # timestep annealing (:320-321)
        n_train = self.guidance.schedule.num_train_timesteps
        max_pct = jnp.where(
            step > cfg.half_scheduler_max_step,
            cfg.max_step_percent_annealed,
            cfg.max_step_percent,
        )
        t_lo = jnp.asarray(n_train * cfg.min_step_percent, jnp.int32)
        t_hi = (n_train * max_pct).astype(jnp.int32)
        u = jax.random.uniform(k_t, (self.camera_cfg.batch_size,))
        t = (t_lo + u * (t_hi + 1 - t_lo)).astype(jnp.int32)

        b = self.camera_cfg.batch_size
        text = self.prompt_embeddings.get_text_embeddings(
            cameras.elevation, cameras.azimuth, cameras.camera_distances
        )
        text3 = text.reshape((3, b) + text.shape[1:])
        return key, k_guid, cameras, pose, text3, t

    # ---- the train step ----------------------------------------------
    def train_step(self, state: TrainState, active_cap: int | None = None,
                   tile_cap: int | None = None, class_fracs="cfg"):
        """Guidance (the big UNet/VAE param pytrees) rides as a jit
        ARGUMENT — closing over it would capture gigabytes of constants
        in the compiled program.

        `active_cap` (static; a power-of-two bucket >= the alive count,
        chosen by train/loop.py) keeps the render's candidate sorts
        sized by the LIVE scene instead of the padded capacity — each
        distinct bucket compiles once as the scene grows.

        `tile_cap` (static) overrides cfg.tile_capacity — train/loop.py
        grows it on a ladder when pair overflow persists (dense scenes
        exceed the per-tile pair cap after densification).

        `class_fracs` (static; "cfg" keeps the config value) is the
        second ladder axis: once tile_cap is maxed, persistent overflow
        means class-cap spill — the loop shifts the candidate-domain
        split toward the (2,2) class (render_batch docstring)."""
        return self._train_step(
            state, self.guidance, active_cap, tile_cap, class_fracs)

    @functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
    def _train_step(self, state: TrainState, guidance, active_cap=None,
                    tile_cap=None, class_fracs="cfg"):
        cfg = self.cfg
        key, k_guid, cameras, pose, text3, t = self.sample_step_inputs(state)
        step = state.step
        params = state.scene.params()
        offset = jnp.zeros((cfg.capacity, 2), jnp.float32)

        def loss_fn(params, offset):
            return self.batch_loss(
                params, offset, state.scene, cameras, pose, text3, t,
                k_guid, step, guidance=guidance, active_cap=active_cap,
                tile_cap=tile_cap, class_fracs=class_fracs,
            )

        (loss, aux), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, offset)
        param_grads, means2d_grad = grads

        # densification stats (on_before_optimizer_step, :378-391)
        visible = aux["radii"] > 0
        if cfg.disable_hand_densification:
            dist = jnp.linalg.norm(
                state.scene.means[:, None, :] - self.hand_centers[None], axis=-1
            )
            visible = visible & ~(jnp.min(dist, axis=-1) < cfg.hand_radius)
        densify_state = update_stats(
            state.densify, means2d_grad, aux["radii"], visible
        )

        lrs = self.optim_cfg.group_lrs(step)
        new_params, adam = adam_step(
            params, param_grads, state.adam, lrs, self.optim_cfg
        )
        scene = state.scene.replace_params(new_params)

        metrics = {
            "loss": loss,
            "loss_sds": aux["loss_sds"],
            "loss_sparsity": aux["loss_sparsity"],
            "loss_opaque": aux["loss_opaque"],
            "grad_norm": aux["grad_norm"],
            "overflow": aux["overflow"],
            "overflow_spill": aux["overflow_spill"],
            "n_alive": scene.num_alive,
        }
        return (
            TrainState(
                scene=scene, adam=adam, densify=densify_state,
                step=step + 1, key=key,
            ),
            metrics,
        )

    # ---- densification (host-scheduled, jitted bodies) ----------------
    def should_densify(self, step: int) -> bool:
        cfg = self.cfg
        return (
            cfg.densify_prune_start_step < step < cfg.densify_prune_end_step
            and step % cfg.densify_prune_interval == 0
        )

    def should_prune_only(self, step: int) -> bool:
        cfg = self.cfg
        return (
            cfg.prune_only_start_step < step < cfg.prune_only_end_step
            and step % cfg.prune_only_interval == 0
        )

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def densify_step(self, state: TrainState, use_size_threshold: bool):
        cfg = self.cfg
        key, k_split = jax.random.split(state.key)
        moments = {"mu": state.adam.mu, "nu": state.adam.nu}
        scene, moments, ds, info = densify_and_prune(
            state.scene, moments, state.densify, k_split,
            max_grad=cfg.max_grad,
            min_opacity=cfg.min_opacity,
            extent=cfg.cameras_extent,
            max_screen_size=cfg.size_threshold if use_size_threshold else None,
        )
        adam = AdamState(mu=moments["mu"], nu=moments["nu"], count=state.adam.count)
        return (
            TrainState(scene=scene, adam=adam, densify=ds, step=state.step, key=key),
            info,
        )

    @functools.partial(jax.jit, static_argnums=(0,))
    def prune_only_step(self, state: TrainState):
        cfg = self.cfg
        moments = {"mu": state.adam.mu, "nu": state.adam.nu}
        scene, moments, ds, info = prune_only(
            state.scene, moments, state.densify,
            min_opacity=0.005, size_thresh=cfg.prune_size_threshold,
        )
        adam = AdamState(mu=moments["mu"], nu=moments["nu"], count=state.adam.count)
        return (
            TrainState(scene=scene, adam=adam, densify=ds, step=state.step,
                       key=state.key),
            info,
        )

    def maybe_densify(self, state: TrainState):
        """Host-side schedule dispatch (GaussianDreamer.py:393-408)."""
        step = int(state.step)
        if self.should_densify(step):
            use_st = step > self.cfg.size_threshold_fix_step
            return self.densify_step(state, use_st)
        if self.should_prune_only(step):
            return self.prune_only_step(state)
        return state, None

    def guidance_eval_snapshot(self, state: TrainState, t_frac: float = 0.5,
                               num_steps: int = 20):
        """Training-time guidance visualization (the reference's
        guidance_eval / guidance_evaluation_save,
        dual_branch_guidance.py:934-1050, GaussianDreamer.py:582-676):
        noise the current render to t, then show the 1-step and fully
        DDIM-denoised images for both branches."""
        g = self.guidance
        key, k_cam, k_enc, k_noise = jax.random.split(state.key, 4)
        cameras = sample_camera_batch(k_cam, state.step, self.camera_cfg)
        pose = self.pose_images(cameras)
        out = self.render_batch(
            state.scene, cameras, self.camera_cfg.height, self.camera_cfg.width
        )
        b = out["image"].shape[0]
        s = g.cfg.image_size

        def resize(x):
            return jax.image.resize(x, (b, s, s, 3), "bilinear")

        depths = out["depth"][..., None]
        dmin = jnp.min(depths, axis=(1, 2, 3), keepdims=True)
        dmax = jnp.max(depths, axis=(1, 2, 3), keepdims=True)
        depth3 = jnp.repeat((depths - dmin) / (dmax - dmin + 1e-10), 3, -1)

        from humangaussian_tpu.guidance.dual_branch import (
            DEPTH_MEAN, DEPTH_STD, RGB_MEAN, RGB_STD, WHOLE_MEAN, WHOLE_STD,
        )

        latents = g.encode_images(resize(out["image"]), k_enc)
        dep_lat = g.encode_images(resize(depth3), k_enc)
        dep_lat = (dep_lat - DEPTH_MEAN) / DEPTH_STD * RGB_STD + RGB_MEAN
        whole = g.encode_images(resize(pose), k_enc)
        whole = (whole - WHOLE_MEAN) / WHOLE_STD * RGB_STD + RGB_MEAN

        t = jnp.full((b,), int(g.schedule.num_train_timesteps * t_frac), jnp.int32)
        noise = jax.random.normal(k_noise, latents.shape)
        lat_noisy = g.schedule.add_noise(latents, noise, t)
        dep_noisy = g.schedule.add_noise(dep_lat, noise, t)
        text3 = self.prompt_embeddings.get_text_embeddings(
            cameras.elevation, cameras.azimuth, cameras.camera_distances
        )
        text2 = text3[: 2 * b]
        strips = g.guidance_eval(
            lat_noisy, dep_noisy, whole, t, text2, num_steps=num_steps
        )
        strips["render"] = out["image"]
        strips["pose"] = pose
        return strips

    # ---- eval ---------------------------------------------------------
    def render_eval(self, scene: GaussianScene, split: str = "val",
                    background=None):
        """Orbit renders (validation_step/test_step, :410-559).

        Eval always renders with the full 3x3 tile rect (32 px splat
        radius) even when the TRAINING config runs the economical 2x2
        rect (16 px cap, configs/avatar.yaml rasterizer note): output
        artifacts keep full splat extents regardless of the training
        speed/fidelity trade."""
        cams = eval_camera_batch(self.camera_cfg, split)
        rcfg = self.raster_cfg
        if rcfg.max_tiles_per_gaussian < 9:
            rcfg = dataclasses.replace(rcfg, max_tiles_per_gaussian=9)
        out = self.render_batch(
            scene, cams, self.camera_cfg.eval_height,
            self.camera_cfg.eval_width, background=background,
            raster_cfg=rcfg,
        )
        return out, cams
