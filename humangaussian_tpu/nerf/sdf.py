"""SDF geometries + NeuS volume renderer.

Ports of the remaining threestudio stock geometry/renderer families
(SURVEY.md §2.8):

- `implicit-sdf` (/root/reference/threestudio/models/geometry/implicit_sdf.py):
  encoding -> SDF MLP (+ feature MLP), sphere-initialized bias, normals
  by analytic gradient or finite differences;
- `volume-grid` (geometry/volume_grid.py): dense voxel grid of
  (density, features) with trilinear interpolation;
- `neus-volume-renderer` (renderers/neus_volume_renderer.py): NeuS
  (Wang et al. 2021) unbiased SDF->alpha from the logistic CDF section
  integral with a learned inverse standard deviation, over the same
  static stratified samples as the NeRF renderer.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from humangaussian_tpu.nerf.encoding import (
    FrequencyEncoding,
    HashGridConfig,
    HashGridEncoding,
)
from humangaussian_tpu.nerf.geometry import VanillaMLP
from humangaussian_tpu.nerf.renderer import RendererConfig, get_rays, ray_aabb


@dataclasses.dataclass(frozen=True)
class ImplicitSDFConfig:
    radius: float = 1.0
    n_feature_dims: int = 3
    encoding: str = "hashgrid"
    hash_cfg: HashGridConfig = HashGridConfig()
    n_frequencies: int = 6
    n_neurons: int = 64
    n_hidden_layers: int = 1
    sdf_bias: str = "sphere"  # "sphere" | "none" (implicit_sdf.py shape init)
    sdf_bias_params: float = 0.5  # sphere radius
    normal_type: str = "analytic"
    finite_difference_eps: float = 0.01


class ImplicitSDF(nn.Module):
    cfg: ImplicitSDFConfig = ImplicitSDFConfig()

    def setup(self):
        c = self.cfg
        if c.encoding == "hashgrid":
            self.encoding = HashGridEncoding(c.hash_cfg)
        else:
            self.encoding = FrequencyEncoding(c.n_frequencies)
        self.sdf_network = VanillaMLP(1, c.n_neurons, c.n_hidden_layers)
        if c.n_feature_dims > 0:
            self.feature_network = VanillaMLP(
                c.n_feature_dims, c.n_neurons, c.n_hidden_layers
            )

    def _scaled(self, points):
        r = self.cfg.radius
        return jnp.clip((points + r) / (2 * r), 0.0, 1.0)

    def _bias(self, points):
        """Shape initialization (implicit_sdf.py get_shifted_sdf): the
        raw MLP output is shifted by an analytic sphere SDF so training
        starts from a well-defined surface."""
        if self.cfg.sdf_bias == "sphere":
            return (
                jnp.linalg.norm(points, axis=-1, keepdims=True)
                - self.cfg.sdf_bias_params
            )
        return 0.0

    def sdf(self, points):
        enc = self.encoding(self._scaled(points))
        return self.sdf_network(enc) + self._bias(points)

    def __call__(self, points, output_normal: bool = False):
        c = self.cfg
        enc = self.encoding(self._scaled(points))
        out = {"sdf": self.sdf_network(enc) + self._bias(points)}
        if c.n_feature_dims > 0:
            out["features"] = self.feature_network(enc)
        if output_normal:
            if c.normal_type == "analytic":
                g = jax.grad(lambda p: jnp.sum(self.sdf(p)))(points)
            else:
                eps = c.finite_difference_eps
                offs = jnp.asarray(
                    [[eps, 0, 0], [-eps, 0, 0], [0, eps, 0],
                     [0, -eps, 0], [0, 0, eps], [0, 0, -eps]],
                    jnp.float32,
                )
                d = self.sdf(points[..., None, :] + offs)
                g = (d[..., 0::2, 0] - d[..., 1::2, 0]) / (2 * eps)
            out["normal"] = g / (
                jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-8
            )
        return out


@dataclasses.dataclass(frozen=True)
class VolumeGridConfig:
    radius: float = 1.0
    grid_size: int = 32
    n_feature_dims: int = 3
    density_bias: float = -1.0


class VolumeGrid(nn.Module):
    """volume-grid geometry: dense [G,G,G, 1+F] voxel values with
    trilinear interpolation (geometry/volume_grid.py)."""

    cfg: VolumeGridConfig = VolumeGridConfig()

    @nn.compact
    def __call__(self, points, output_normal: bool = False):
        c = self.cfg
        grid = self.param(
            "grid",
            nn.initializers.normal(0.1),
            (c.grid_size,) * 3 + (1 + c.n_feature_dims,),
        )
        u = jnp.clip(
            (points + c.radius) / (2 * c.radius), 0.0, 1.0
        ) * (c.grid_size - 1)
        u0 = jnp.floor(u).astype(jnp.int32)
        frac = u - u0
        lead = points.shape[:-1]
        u0f = u0.reshape(-1, 3)
        fracf = frac.reshape(-1, 3)
        acc = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    idx = jnp.clip(
                        u0f + jnp.array([dx, dy, dz]), 0, c.grid_size - 1
                    )
                    w = (
                        (fracf[:, 0] if dx else 1 - fracf[:, 0])
                        * (fracf[:, 1] if dy else 1 - fracf[:, 1])
                        * (fracf[:, 2] if dz else 1 - fracf[:, 2])
                    )
                    acc = acc + w[:, None] * grid[
                        idx[:, 0], idx[:, 1], idx[:, 2]
                    ]
        vals = acc.reshape(lead + (1 + c.n_feature_dims,))
        out = {
            "density": jax.nn.softplus(vals[..., :1] + c.density_bias),
            "features": vals[..., 1:],
        }
        return out


class NeusVolumeRenderer:
    """NeuS renderer over static stratified samples.

    NeuS section alpha with the official cos-annealed estimator
    (neus_volume_renderer.py get_alpha): the section's prev/next SDF are
    extrapolated from the RAY-DIRECTIONAL derivative d(sdf)/dt — which
    IS dot(grad sdf, dir), estimated from consecutive samples without a
    gradient pass — annealed by `cos_anneal_ratio` (0 at the start of
    training: isotropic 0.5*(1-cos) weighting that trains from all view
    angles; 1 after the anneal window: only descending sections
    contribute), then
      alpha = clip((Phi(s*prev) - Phi(s*next)) / Phi(s*prev), 0, 1)
    with Phi the logistic CDF and s the LEARNED inverse std (the
    `variance` parameter trained alongside the field)."""

    def __init__(self, geometry, material, background,
                 cfg: RendererConfig = RendererConfig(),
                 learned_variance_init: float = 0.3):
        self.geometry = geometry
        self.material = material
        self.background = background
        self.cfg = cfg
        self.variance_init = learned_variance_init

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
        return {
            "geometry": gp,
            "material": mp,
            "background": bp,
            "variance": jnp.asarray(self.variance_init, jnp.float32),
        }

    def render_rays(self, params, origins, dirs, rng=None,
                    cos_anneal_ratio=1.0):
        c = self.cfg
        r = origins.shape[0]
        s_count = c.num_samples_per_ray
        t_near, t_far = ray_aabb(origins, dirs, c.radius, c.near_plane)
        frac = (jnp.arange(s_count, dtype=jnp.float32) + 0.5) / s_count
        if c.randomized and rng is not None:
            frac = frac[None, :] + (
                jax.random.uniform(rng, (r, s_count)) - 0.5
            ) / s_count
        else:
            frac = jnp.broadcast_to(frac, (r, s_count))
        t = t_near[:, None] + (t_far - t_near)[:, None] * frac
        pts = origins[:, None, :] + dirs[:, None, :] * t[..., None]

        geo = self.geometry.apply(params["geometry"], pts)
        sdf = geo["sdf"][..., 0]  # [R,S]
        inv_s = jnp.exp(10.0 * params["variance"])  # NeuS variance param
        dt = (t_far - t_near)[:, None] / s_count
        # d(sdf)/dt along the ray = dot(grad sdf, dir) ("true cos"),
        # estimated from consecutive samples; last section repeats
        dsdf = jnp.diff(sdf, axis=-1)
        true_cos = jnp.concatenate(
            [dsdf, dsdf[:, -1:]], axis=-1
        ) / (dt + 1e-8)
        ratio = jnp.asarray(cos_anneal_ratio, jnp.float32)
        iter_cos = -(
            jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - ratio)
            + jax.nn.relu(-true_cos) * ratio
        )
        est_prev = sdf - iter_cos * dt * 0.5
        est_next = sdf + iter_cos * dt * 0.5
        prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
        next_cdf = jax.nn.sigmoid(est_next * inv_s)
        alpha = jnp.clip(
            (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5), 0.0, 1.0
        )
        trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
        trans = jnp.concatenate(
            [jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-1
        )
        weights = alpha * trans

        rgb = self.material.apply(params["material"], geo["features"])
        comp_rgb = jnp.sum(weights[..., None] * rgb, axis=-2)
        opacity = jnp.sum(weights, axis=-1, keepdims=True)
        depth = jnp.sum(weights * t, axis=-1, keepdims=True)
        bg = self.background.apply(params["background"], dirs)
        return {
            "comp_rgb": comp_rgb + (1.0 - opacity) * bg,
            "opacity": opacity,
            "depth": depth,
            "weights": weights,
            "sdf": sdf,
        }

    def render_image(self, params, c2w, fovy, height, width, rng=None):
        origins, dirs = get_rays(c2w, fovy, height, width)
        out = self.render_rays(
            params, origins.reshape(-1, 3), dirs.reshape(-1, 3), rng
        )
        return jax.tree.map(
            lambda x: x.reshape((height, width) + x.shape[1:]), out
        )
