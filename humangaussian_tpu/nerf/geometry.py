"""Implicit-volume geometry (density + feature field), flax.

Port of the reference's `implicit-volume`
(/root/reference/threestudio/models/geometry/implicit_volume.py):
encoding -> VanillaMLP density head (+ feature head), density-blob bias
(blob_magic3d / blob_dreamfusion, :80-101), softplus activation, normals
by analytic gradient or central finite differences (:118-172), with the
bbox rescale to [0,1]^3 (base.py contract, radius box).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from humangaussian_tpu.nerf.encoding import (
    FrequencyEncoding,
    HashGridConfig,
    HashGridEncoding,
)


@dataclasses.dataclass(frozen=True)
class ImplicitVolumeConfig:
    radius: float = 1.0
    n_feature_dims: int = 3
    encoding: str = "hashgrid"  # "hashgrid" | "frequency"
    hash_cfg: HashGridConfig = HashGridConfig()
    n_frequencies: int = 6
    n_neurons: int = 64
    n_hidden_layers: int = 1
    density_activation: str = "softplus"
    density_bias: Any = "blob_magic3d"
    density_blob_scale: float = 10.0
    density_blob_std: float = 0.5
    normal_type: str = "analytic"  # "analytic" | "finite_difference"
    finite_difference_eps: float = 0.01


class VanillaMLP(nn.Module):
    """threestudio VanillaMLP: ReLU hidden layers, no output activation
    (models/networks.py)."""

    out_dims: int
    n_neurons: int
    n_hidden_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_hidden_layers):
            x = nn.relu(nn.Dense(self.n_neurons, name=f"hidden_{i}")(x))
        return nn.Dense(self.out_dims, name="out")(x)


class ImplicitVolume(nn.Module):
    cfg: ImplicitVolumeConfig = ImplicitVolumeConfig()

    def setup(self):
        c = self.cfg
        if c.encoding == "hashgrid":
            self.encoding = HashGridEncoding(c.hash_cfg)
        elif c.encoding == "frequency":
            self.encoding = FrequencyEncoding(c.n_frequencies)
        else:
            raise ValueError(f"unknown encoding {c.encoding!r}")
        self.density_network = VanillaMLP(1, c.n_neurons, c.n_hidden_layers)
        if c.n_feature_dims > 0:
            self.feature_network = VanillaMLP(
                c.n_feature_dims, c.n_neurons, c.n_hidden_layers
            )

    # ---- density ------------------------------------------------------
    def _density_bias(self, points):
        """Pre-activation bias shaping an initial blob (:80-101).
        `points` in the ORIGINAL scale."""
        c = self.cfg
        if c.density_bias == "blob_dreamfusion":
            return c.density_blob_scale * jnp.exp(
                -0.5 * jnp.sum(points**2, -1) / c.density_blob_std**2
            )[..., None]
        if c.density_bias == "blob_magic3d":
            return c.density_blob_scale * (
                1.0
                - jnp.sqrt(jnp.sum(points**2, -1)) / c.density_blob_std
            )[..., None]
        return jnp.asarray(c.density_bias)

    def _activate(self, raw):
        act = self.cfg.density_activation
        if act == "softplus":
            return jax.nn.softplus(raw)
        if act == "exp":
            return jnp.exp(raw)
        if act == "trunc_exp":  # exp with clamped input (stable grad)
            return jnp.exp(jnp.clip(raw, -15.0, 15.0))
        raise ValueError(f"unknown density activation {act!r}")

    def _scaled(self, points):
        """world points in [-radius, radius]^3 -> [0, 1]^3."""
        r = self.cfg.radius
        return jnp.clip((points + r) / (2 * r), 0.0, 1.0)

    def density(self, points):
        enc = self.encoding(self._scaled(points))
        raw = self.density_network(enc) + self._density_bias(points)
        return self._activate(raw)

    def __call__(self, points, output_normal: bool = False):
        """points [.., 3] world -> dict(density [..,1],
        features [.., F], normal [.., 3] optional)."""
        c = self.cfg
        enc = self.encoding(self._scaled(points))
        raw = self.density_network(enc) + self._density_bias(points)
        out = {"density": self._activate(raw)}
        if c.n_feature_dims > 0:
            out["features"] = self.feature_network(enc)
        if output_normal:
            if c.normal_type == "analytic":
                g = jax.grad(
                    lambda p: jnp.sum(self.density(p))
                )(points)
            elif c.normal_type == "finite_difference":
                eps = c.finite_difference_eps
                offs = jnp.asarray(
                    [[eps, 0, 0], [-eps, 0, 0], [0, eps, 0],
                     [0, -eps, 0], [0, 0, eps], [0, 0, -eps]],
                    jnp.float32,
                )
                d = self.density(
                    points[..., None, :] + offs
                )  # [.., 6, 1]
                g = (d[..., 0::2, 0] - d[..., 1::2, 0]) / (2 * eps)
            else:
                raise ValueError(f"unknown normal type {c.normal_type!r}")
            n = -g / (
                jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-8
            )
            out["normal"] = n
        return out
