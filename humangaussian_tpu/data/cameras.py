"""Random-camera curriculum sampling as pure functions of a PRNG key.

TPU-first re-design of the reference `random-camera-datamodule`
(/root/reference/threestudio/data/uncond.py:162-523): instead of a
stateful torch IterableDataset on the host, a camera batch is a pure
function of (rng key, step, config) — fully jittable, so the sampler can
live INSIDE the compiled train step and stay reproducible across hosts
(every host derives the same key).

Semantics mirrored from uncond.py `collate` (:300-523):
- zoom-in curriculum: with prob `head_prob` (steps head_start..end) the
  camera orbits the head (short distance, azimuth [0,180], z += 0.65);
  else with prob `back_prob` the back; else full-body (:303-320);
- elevation: 50/50 uniform-in-angle vs uniform-on-sphere (:325-349);
- azimuth stratified across the batch (batch_uniform_azimuth, :353-361);
- world frame: right-handed, x back / y right / z up; camera from
  spherical coords, lookat at the (offset) center (:379-388,485-495);
- fovy uniform in [40, 70] deg (:176-182); light sampled around the
  camera (dreamfusion strategy, :438-448);
- mvp matrix via the nvdiffrast-convention projection (y flipped,
  near 0.1 / far 1000 — threestudio/utils/ops.py:266-292) — this is the
  matrix the skeleton pose image is drawn with;
- eval: azimuth sweep at fixed elevation/distance (:526-640).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RandomCameraConfig:
    """Defaults = configs/test.yaml:7-33 over uncond.py:162-210."""

    batch_size: int = 8
    height: int = 1024
    width: int = 1024
    elevation_range: tuple = (-30.0, 30.0)
    azimuth_range: tuple = (-180.0, 180.0)
    camera_distance_range: tuple = (1.5, 2.0)
    fovy_range: tuple = (40.0, 70.0)
    camera_perturb: float = 0.0
    center_perturb: float = 0.0
    up_perturb: float = 0.0
    light_distance_range: tuple = (0.8, 1.5)
    light_position_perturb: float = 1.0
    batch_uniform_azimuth: bool = True
    # zoom-in curriculum
    enable_near_head_poses: bool = True
    head_offset: float = 0.65
    head_camera_distance_range: tuple = (0.4, 0.6)
    head_prob: float = 0.25
    head_start_step: int = 1200
    head_end_step: int = 3600
    head_azimuth_range: tuple = (0.0, 180.0)
    enable_near_back_poses: bool = True
    back_offset: float = 0.65
    back_camera_distance_range: tuple = (0.6, 0.8)
    back_prob: float = 0.20
    back_start_step: int = 1200
    back_end_step: int = 3600
    back_azimuth_range: tuple = (-180.0, 0.0)
    frontal_prob: float = 0.0
    frontal_azimuth_range: tuple = (45.0, 135.0)
    # eval
    eval_height: int = 1024
    eval_width: int = 1024
    eval_elevation_deg: float = 15.0
    eval_camera_distance: float = 2.0
    eval_fovy_deg: float = 70.0
    n_val_views: int = 4
    n_test_views: int = 120


class CameraBatch(NamedTuple):
    c2w: jnp.ndarray  # [B,4,4] OpenGL camera-to-world
    mvp_mtx: jnp.ndarray  # [B,4,4] proj @ w2c (pose-image convention)
    camera_positions: jnp.ndarray  # [B,3]
    light_positions: jnp.ndarray  # [B,3]
    elevation: jnp.ndarray  # [B] degrees
    azimuth: jnp.ndarray  # [B] degrees
    camera_distances: jnp.ndarray  # [B]
    fovy: jnp.ndarray  # [B] radians
    is_head: jnp.ndarray  # [] bool — head zoom-in batch
    is_back: jnp.ndarray  # [] bool


def get_projection_matrix(fovy, aspect_wh, near=0.1, far=1000.0):
    """threestudio/utils/ops.py:266-278 (y flipped, OpenGL z in [-1,1])."""
    b = fovy.shape[0]
    t = jnp.tan(fovy / 2.0)
    zeros = jnp.zeros((b,), jnp.float32)
    rows = [
        jnp.stack([1.0 / (t * aspect_wh), zeros, zeros, zeros], -1),
        jnp.stack([zeros, -1.0 / t, zeros, zeros], -1),
        jnp.stack(
            [zeros, zeros,
             jnp.full((b,), -(far + near) / (far - near)),
             jnp.full((b,), -2.0 * far * near / (far - near))], -1,
        ),
        jnp.stack([zeros, zeros, jnp.full((b,), -1.0), zeros], -1),
    ]
    return jnp.stack(rows, axis=1)


def get_mvp_matrix(c2w, proj_mtx):
    """threestudio/utils/ops.py:281-292."""
    rt = jnp.swapaxes(c2w[:, :3, :3], 1, 2)
    t = -rt @ c2w[:, :3, 3:]
    w2c = jnp.zeros_like(c2w)
    w2c = w2c.at[:, :3, :3].set(rt)
    w2c = w2c.at[:, :3, 3:].set(t)
    w2c = w2c.at[:, 3, 3].set(1.0)
    return proj_mtx @ w2c


def _c2w_from_lookat(camera_positions, center, up):
    lookat = center - camera_positions
    lookat = lookat / jnp.linalg.norm(lookat, axis=-1, keepdims=True)
    right = jnp.cross(lookat, up)
    right = right / jnp.linalg.norm(right, axis=-1, keepdims=True)
    up2 = jnp.cross(right, lookat)
    up2 = up2 / jnp.linalg.norm(up2, axis=-1, keepdims=True)
    b = camera_positions.shape[0]
    c2w = jnp.zeros((b, 4, 4), jnp.float32)
    c2w = c2w.at[:, :3, 0].set(right)
    c2w = c2w.at[:, :3, 1].set(up2)
    c2w = c2w.at[:, :3, 2].set(-lookat)
    c2w = c2w.at[:, :3, 3].set(camera_positions)
    return c2w.at[:, 3, 3].set(1.0)


def sample_camera_batch(
    key: jax.Array, step, cfg: RandomCameraConfig = RandomCameraConfig()
) -> CameraBatch:
    """One training camera batch (uncond.py:300-523). `step` may be traced."""
    b = cfg.batch_size
    keys = jax.random.split(key, 12)
    step = jnp.asarray(step)

    u_mode, u_head, u_back, u_front = jax.random.uniform(keys[0], (4,))
    head_on = (
        cfg.enable_near_head_poses
        & (u_head < cfg.head_prob)
        & (step >= cfg.head_start_step)
        & (step <= cfg.head_end_step)
    )
    back_on = (
        (~head_on)
        & cfg.enable_near_back_poses
        & (u_back < cfg.back_prob)
        & (step >= cfg.back_start_step)
        & (step <= cfg.back_end_step)
    )
    frontal_on = (~head_on) & (~back_on) & (u_front < cfg.frontal_prob)

    def pick(head_v, back_v, base_v):
        head_v, back_v, base_v = map(jnp.asarray, (head_v, back_v, base_v))
        return jnp.where(head_on, head_v, jnp.where(back_on, back_v, base_v))

    az_lo = pick(
        cfg.head_azimuth_range[0], cfg.back_azimuth_range[0],
        jnp.where(frontal_on, cfg.frontal_azimuth_range[0], cfg.azimuth_range[0]),
    )
    az_hi = pick(
        cfg.head_azimuth_range[1], cfg.back_azimuth_range[1],
        jnp.where(frontal_on, cfg.frontal_azimuth_range[1], cfg.azimuth_range[1]),
    )
    dist_lo = pick(
        cfg.head_camera_distance_range[0], cfg.back_camera_distance_range[0],
        cfg.camera_distance_range[0],
    )
    dist_hi = pick(
        cfg.head_camera_distance_range[1], cfg.back_camera_distance_range[1],
        cfg.camera_distance_range[1],
    )
    z_offset = pick(cfg.head_offset, cfg.back_offset, 0.0)

    # elevation: 50% uniform in angle, 50% uniform on the sphere (:325-349)
    lo, hi = cfg.elevation_range
    elev_uniform = jax.random.uniform(keys[1], (b,), minval=lo, maxval=hi)
    p_lo, p_hi = (lo + 90.0) / 180.0, (hi + 90.0) / 180.0
    u = jax.random.uniform(keys[2], (b,), minval=p_lo, maxval=p_hi)
    elev_sphere = jnp.rad2deg(jnp.arcsin(2.0 * u - 1.0))
    elevation_deg = jnp.where(u_mode < 0.5, elev_uniform, elev_sphere)

    # stratified azimuth (:353-361)
    if cfg.batch_uniform_azimuth:
        frac = (jax.random.uniform(keys[3], (b,)) + jnp.arange(b)) / b
    else:
        frac = jax.random.uniform(keys[3], (b,))
    azimuth_deg = frac * (az_hi - az_lo) + az_lo

    camera_distances = jax.random.uniform(
        keys[4], (b,), minval=0.0, maxval=1.0
    ) * (dist_hi - dist_lo) + dist_lo

    elevation = jnp.deg2rad(elevation_deg)
    azimuth = jnp.deg2rad(azimuth_deg)
    camera_positions = jnp.stack(
        [
            camera_distances * jnp.cos(elevation) * jnp.cos(azimuth),
            camera_distances * jnp.cos(elevation) * jnp.sin(azimuth),
            camera_distances * jnp.sin(elevation),
        ],
        axis=-1,
    )
    center = jnp.zeros_like(camera_positions)
    center = center.at[:, 2].add(z_offset)
    camera_positions = camera_positions.at[:, 2].add(z_offset)

    up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (b, 3))
    if cfg.camera_perturb > 0:
        camera_positions = camera_positions + jax.random.uniform(
            keys[5], (b, 3), minval=-cfg.camera_perturb, maxval=cfg.camera_perturb
        )
    if cfg.center_perturb > 0:
        center = center + jax.random.normal(keys[6], (b, 3)) * cfg.center_perturb
    if cfg.up_perturb > 0:
        up = up + jax.random.normal(keys[7], (b, 3)) * cfg.up_perturb

    fovy_deg = jax.random.uniform(
        keys[8], (b,), minval=cfg.fovy_range[0], maxval=cfg.fovy_range[1]
    )
    fovy = jnp.deg2rad(fovy_deg)

    light_distances = jax.random.uniform(
        keys[9], (b,),
        minval=cfg.light_distance_range[0], maxval=cfg.light_distance_range[1],
    )
    light_dir = camera_positions + jax.random.normal(
        keys[10], (b, 3)
    ) * cfg.light_position_perturb
    light_dir = light_dir / jnp.linalg.norm(light_dir, axis=-1, keepdims=True)
    light_positions = light_dir * light_distances[:, None]

    c2w = _c2w_from_lookat(camera_positions, center, up)
    proj = get_projection_matrix(fovy, cfg.width / cfg.height)
    mvp = get_mvp_matrix(c2w, proj)
    return CameraBatch(
        c2w=c2w,
        mvp_mtx=mvp,
        camera_positions=camera_positions,
        light_positions=light_positions,
        elevation=elevation_deg,
        azimuth=azimuth_deg,
        camera_distances=camera_distances,
        fovy=fovy,
        is_head=head_on,
        is_back=back_on,
    )


def c2w_from_angles(elevation_deg, azimuth_deg, camera_distances):
    """[B] spherical angles (degrees) + distances -> [B,4,4] c2w
    (z-up world, camera looking at the origin — the shared convention)."""
    elevation = jnp.deg2rad(jnp.asarray(elevation_deg, jnp.float32))
    azimuth = jnp.deg2rad(jnp.asarray(azimuth_deg, jnp.float32))
    d = jnp.asarray(camera_distances, jnp.float32)
    camera_positions = jnp.stack(
        [
            d * jnp.cos(elevation) * jnp.cos(azimuth),
            d * jnp.cos(elevation) * jnp.sin(azimuth),
            d * jnp.sin(elevation),
        ],
        axis=-1,
    )
    center = jnp.zeros_like(camera_positions)
    up = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0]), camera_positions.shape
    )
    return _c2w_from_lookat(camera_positions, center, up)


def eval_camera_batch(
    cfg: RandomCameraConfig = RandomCameraConfig(), split: str = "test"
) -> CameraBatch:
    """Deterministic azimuth sweep for val (4 views) / test (120 views),
    uncond.py:526-640."""
    n = cfg.n_val_views if split == "val" else cfg.n_test_views
    if split == "val":
        azimuth_deg = jnp.linspace(-180.0, 180.0, n + 1)[:n]
    else:
        azimuth_deg = jnp.linspace(-180.0, 180.0, n)
    elevation_deg = jnp.full((n,), cfg.eval_elevation_deg)
    camera_distances = jnp.full((n,), cfg.eval_camera_distance)
    elevation = jnp.deg2rad(elevation_deg)
    azimuth = jnp.deg2rad(azimuth_deg)
    camera_positions = jnp.stack(
        [
            camera_distances * jnp.cos(elevation) * jnp.cos(azimuth),
            camera_distances * jnp.cos(elevation) * jnp.sin(azimuth),
            camera_distances * jnp.sin(elevation),
        ],
        axis=-1,
    )
    center = jnp.zeros_like(camera_positions)
    up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    fovy = jnp.full((n,), jnp.deg2rad(cfg.eval_fovy_deg))
    c2w = _c2w_from_lookat(camera_positions, center, up)
    proj = get_projection_matrix(fovy, cfg.eval_width / cfg.eval_height)
    mvp = get_mvp_matrix(c2w, proj)
    return CameraBatch(
        c2w=c2w,
        mvp_mtx=mvp,
        camera_positions=camera_positions,
        light_positions=camera_positions,
        elevation=elevation_deg,
        azimuth=azimuth_deg,
        camera_distances=camera_distances,
        fovy=fovy,
        is_head=jnp.asarray(False),
        is_back=jnp.asarray(False),
    )
