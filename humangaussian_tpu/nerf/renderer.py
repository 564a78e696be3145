"""NeRF volume renderer: static-shape stratified ray marching, flax.

Port of /root/reference/threestudio/models/renderers/nerf_volume_renderer.py
re-designed for TPU: nerfacc's occupancy-grid estimator produces
dynamically-sized sample lists (a CUDA-friendly, XLA-hostile shape); here
every ray takes a STATIC number of stratified samples inside its
ray/bbox intersection interval, so the whole render is one fused XLA
program (dense [rays, samples] tensors feeding the MXU through the
field MLPs). Empty space costs sigma=0 samples instead of list
compaction — the compiler-friendly trade.

Compositing matches the reference renderer's weights
(alpha_i = 1 - exp(-sigma_i * dt_i), T_i = prod_{j<i} (1 - alpha_j)):
comp_rgb = sum w_i c_i + (1 - opacity) * background(dirs).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def get_rays(c2w, fovy, height: int, width: int):
    """Per-pixel rays, OpenGL convention (camera looks down -z), pixel
    centers at +0.5 (threestudio utils/ops.py get_ray_directions).
    c2w: [4,4] or [3,4]. Returns (origins [H,W,3], dirs [H,W,3])."""
    focal = 0.5 * height / jnp.tan(0.5 * fovy)
    x = (jnp.arange(width, dtype=jnp.float32) + 0.5 - width / 2) / focal
    y = (jnp.arange(height, dtype=jnp.float32) + 0.5 - height / 2) / focal
    xx, yy = jnp.meshgrid(x, y)
    dirs_cam = jnp.stack([xx, -yy, -jnp.ones_like(xx)], axis=-1)
    dirs = dirs_cam @ c2w[:3, :3].T
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(c2w[:3, 3], dirs.shape)
    return origins, dirs


def ray_aabb(origins, dirs, radius: float, near_min: float = 0.05):
    """Ray / [-r, r]^3 box intersection -> (t_near, t_far) per ray;
    rays that miss get an empty (t_near >= t_far) interval."""
    inv = 1.0 / jnp.where(jnp.abs(dirs) > 1e-8, dirs, 1e-8)
    t0 = (-radius - origins) * inv
    t1 = (radius - origins) * inv
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_near = jnp.maximum(t_near, near_min)
    return t_near, jnp.maximum(t_far, t_near)


@dataclasses.dataclass(frozen=True)
class RendererConfig:
    num_samples_per_ray: int = 96
    radius: float = 1.0
    randomized: bool = True
    near_plane: float = 0.05
    num_importance_samples: int = 0  # coarse-to-fine: extra samples
    #   drawn from the coarse pass's weight PDF (the static-shape
    #   XLA-friendly replacement for nerfacc's occupancy-grid estimator,
    #   nerf_volume_renderer.py:37-90 — same goal: concentrate samples
    #   where the field is, instead of paying empty space in full)


def sample_pdf(t, weights, n_samples: int, rng=None):
    """Inverse-CDF resampling of n_samples new depths from the coarse
    pass's piecewise-constant weight PDF (NeRF fine sampling; static
    shapes). t [R,S] coarse sample depths, weights [R,S] -> [R,n]."""
    r, s = t.shape
    w = jax.lax.stop_gradient(weights) + 1e-5  # sampling is an estimator
    cdf = jnp.cumsum(w, axis=-1)
    cdf = cdf / cdf[:, -1:]
    u = (jnp.arange(n_samples, dtype=jnp.float32) + 0.5) / n_samples
    if rng is not None:
        u = u[None, :] + (
            jax.random.uniform(rng, (r, n_samples)) - 0.5
        ) / n_samples
        u = jnp.clip(u, 1e-5, 1.0 - 1e-5)
    else:
        u = jnp.broadcast_to(u, (r, n_samples))
    idx = jax.vmap(jnp.searchsorted)(cdf, u)  # [R,n] bin indices
    idx = jnp.clip(idx, 0, s - 1)
    cdf_lo = jnp.where(
        idx > 0, jnp.take_along_axis(cdf, jnp.maximum(idx - 1, 0), 1), 0.0
    )
    cdf_hi = jnp.take_along_axis(cdf, idx, axis=-1)
    t_lo = jnp.where(
        idx > 0, jnp.take_along_axis(t, jnp.maximum(idx - 1, 0), 1),
        jnp.take_along_axis(t, idx, axis=-1),
    )
    t_hi = jnp.take_along_axis(t, idx, axis=-1)
    frac = (u - cdf_lo) / jnp.maximum(cdf_hi - cdf_lo, 1e-8)
    return t_lo + frac * (t_hi - t_lo)


class NerfVolumeRenderer:
    """Functional renderer: geometry/material/background are flax
    modules applied with caller-held params (the TPU replacement for the
    reference's stateful Renderer module tree)."""

    def __init__(self, geometry, material, background,
                 cfg: RendererConfig = RendererConfig()):
        self.geometry = geometry
        self.material = material
        self.background = background
        self.cfg = cfg

    def render_rays(self, params, origins, dirs, rng=None,
                    light_positions=None, shading: str = "albedo",
                    output_normal: bool = False):
        """origins/dirs [R, 3] -> dict(comp_rgb [R,3], opacity [R,1],
        depth [R,1], weights [R,S])."""
        c = self.cfg
        r = origins.shape[0]
        s = c.num_samples_per_ray
        t_near, t_far = ray_aabb(origins, dirs, c.radius, c.near_plane)
        frac = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
        if c.randomized and rng is not None:
            k_coarse, k_fine = jax.random.split(rng)
            jitter = (jax.random.uniform(k_coarse, (r, s)) - 0.5) / s
            frac = frac[None, :] + jitter
        else:
            k_fine = None
            frac = jnp.broadcast_to(frac, (r, s))
        t = t_near[:, None] + (t_far - t_near)[:, None] * frac  # [R,S]

        if c.num_importance_samples > 0:
            # coarse sigma-only pass -> importance-resample -> the union
            # of coarse+fine depths feeds the full shaded pass below
            dt_c = (t_far - t_near)[:, None] / s
            pts_c = origins[:, None, :] + dirs[:, None, :] * t[..., None]
            geo_c = self.geometry.apply(params["geometry"], pts_c)
            sigma_c = jax.lax.stop_gradient(geo_c["density"][..., 0])
            alpha_c = 1.0 - jnp.exp(-sigma_c * dt_c)
            trans_c = jnp.cumprod(1.0 - alpha_c + 1e-10, axis=-1)
            trans_c = jnp.concatenate(
                [jnp.ones_like(trans_c[:, :1]), trans_c[:, :-1]], axis=-1
            )
            t_fine = sample_pdf(
                t, alpha_c * trans_c, c.num_importance_samples, k_fine
            )
            t = jnp.sort(jnp.concatenate([t, t_fine], axis=-1), axis=-1)

        if c.num_importance_samples > 0:
            # per-section dt from the (merged, non-uniform) depths
            dt = jnp.diff(
                t, axis=-1,
                append=jnp.maximum(t_far, t[:, -1] + 1e-4)[:, None],
            )
        else:
            dt = (t_far - t_near)[:, None] / s
        pts = origins[:, None, :] + dirs[:, None, :] * t[..., None]

        geo = self.geometry.apply(
            params["geometry"], pts, output_normal=output_normal
        )
        sigma = geo["density"][..., 0]  # [R,S(+F)]
        alpha = 1.0 - jnp.exp(-sigma * dt)
        trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
        trans = jnp.concatenate(
            [jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-1
        )
        weights = alpha * trans  # [R,S]

        mat_kwargs = {}
        if output_normal:
            mat_kwargs["normal"] = geo["normal"]
            mat_kwargs["positions"] = pts
            if light_positions is not None:
                mat_kwargs["light_positions"] = light_positions[:, None, :]
        rgb = self.material.apply(
            params["material"], geo["features"], shading=shading,
            **mat_kwargs,
        )  # [R,S,3]

        comp_rgb = jnp.sum(weights[..., None] * rgb, axis=-2)
        opacity = jnp.sum(weights, axis=-1, keepdims=True)
        depth = jnp.sum(weights * t, axis=-1, keepdims=True)
        bg = self.background.apply(params["background"], dirs)
        out = {
            "comp_rgb": comp_rgb + (1.0 - opacity) * bg,
            "comp_rgb_fg": comp_rgb,
            "opacity": opacity,
            "depth": depth,
            "weights": weights,
        }
        if output_normal:
            normal = jnp.sum(weights[..., None] * geo["normal"], axis=-2)
            out["comp_normal"] = normal
        return out

    def render_image(self, params, c2w, fovy, height: int, width: int,
                     rng=None, camera_position=None, shading="albedo",
                     output_normal=False):
        origins, dirs = get_rays(c2w, fovy, height, width)
        flat_o = origins.reshape(-1, 3)
        flat_d = dirs.reshape(-1, 3)
        light = (
            jnp.broadcast_to(camera_position, flat_o.shape)
            if camera_position is not None else None
        )
        out = self.render_rays(
            params, flat_o, flat_d, rng, light, shading, output_normal
        )
        return jax.tree.map(
            lambda x: x.reshape((height, width) + x.shape[1:]), out
        )

    def init_params(self, rng, n_rays: int = 8):
        kg, km, kb = jax.random.split(rng, 3)
        pts = jnp.zeros((n_rays, self.cfg.num_samples_per_ray, 3))
        gp = self.geometry.init(kg, pts)
        feats = jnp.zeros(
            (n_rays, self.cfg.num_samples_per_ray,
             self.geometry.cfg.n_feature_dims)
        )
        mp = self.material.init(km, feats)
        bp = self.background.init(kb, jnp.zeros((n_rays, 3)))
        return {"geometry": gp, "material": mp, "background": bp}
