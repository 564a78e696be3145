"""Backgrounds (per-ray colors behind the volume), flax.

Ports of /root/reference/threestudio/models/background/:
- solid_color_background.py: fixed or learned constant color, optional
  random augmentation during training;
- neural_environment_map_background.py: frequency-encoded view
  directions -> MLP -> color.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from humangaussian_tpu.nerf.encoding import FrequencyEncoding
from humangaussian_tpu.nerf.geometry import VanillaMLP


class SolidColorBackground(nn.Module):
    """solid-color-background: color [3], optionally learned
    (solid_color_background.py)."""

    color: tuple = (1.0, 1.0, 1.0)
    learned: bool = False

    @nn.compact
    def __call__(self, dirs):
        c = jnp.asarray(self.color, jnp.float32)
        if self.learned:
            c = self.param("env_color", lambda _: c)
        # len(color) may exceed 3 for latent-channel renderers
        # (gan-volume-renderer pairs with hybrid-rgb-latent-material)
        return jnp.broadcast_to(c, dirs.shape[:-1] + c.shape)


class NeuralEnvironmentMapBackground(nn.Module):
    """neural-environment-map-background: dir -> freq encoding -> MLP ->
    sigmoid color (neural_environment_map_background.py)."""

    color_activation: str = "sigmoid"
    n_frequencies: int = 10
    n_neurons: int = 16
    n_hidden_layers: int = 2

    @nn.compact
    def __call__(self, dirs):
        d = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-8)
        enc = FrequencyEncoding(self.n_frequencies)(d)
        rgb = VanillaMLP(3, self.n_neurons, self.n_hidden_layers)(enc)
        if self.color_activation == "sigmoid":
            return jax.nn.sigmoid(rgb)
        return jnp.clip(rgb, 0.0, 1.0)


class TexturedBackground(nn.Module):
    """textured-background: a learned equirectangular texture sampled
    by view direction (textured_background.py)."""

    height: int = 64
    width: int = 128

    @nn.compact
    def __call__(self, dirs):
        tex = self.param(
            "texture", nn.initializers.constant(0.5),
            (self.height, self.width, 3),
        )
        d = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-8)
        u = (jnp.arctan2(d[..., 1], d[..., 0]) / (2 * jnp.pi) + 0.5)
        v = jnp.arccos(jnp.clip(d[..., 2], -1.0, 1.0)) / jnp.pi
        xi = jnp.clip((u * self.width).astype(jnp.int32), 0, self.width - 1)
        yi = jnp.clip((v * self.height).astype(jnp.int32), 0, self.height - 1)
        return jax.nn.sigmoid(tex[yi, xi] * 4.0 - 2.0)
