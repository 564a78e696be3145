"""Materials (feature -> shaded color), flax.

Ports of /root/reference/threestudio/models/materials/:
- no_material.py: color = activation(features[..., :3]);
- diffuse_with_point_light_material.py: lambertian albedo shading with
  a point light that follows the camera, the DreamFusion shading model
  (ambient + diffuse, random shading mode schedule handled by caller).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class NoMaterial(nn.Module):
    """no-material: direct sigmoid color from geometry features."""

    color_activation: str = "sigmoid"

    @nn.compact
    def __call__(self, features, **_):
        rgb = features[..., :3]
        if self.color_activation == "sigmoid":
            return jax.nn.sigmoid(rgb)
        if self.color_activation == "scale_-11_01":
            return jnp.clip(rgb * 0.5 + 0.5, 0.0, 1.0)
        return jnp.clip(rgb, 0.0, 1.0)


class DiffuseWithPointLightMaterial(nn.Module):
    """diffuse-with-point-light-material: albedo = sigmoid(feat[:3]);
    color = albedo * (ambient + diffuse * max(dot(n, l), 0)) under
    `shading="diffuse"`, albedo under `shading="albedo"`, and the
    textureless gray under `shading="textureless"`
    (diffuse_with_point_light_material.py:55-116)."""

    ambient_light_color: tuple = (0.1, 0.1, 0.1)
    diffuse_light_color: tuple = (0.9, 0.9, 0.9)

    @nn.compact
    def __call__(self, features, positions=None, normal=None,
                 light_positions=None, shading: str = "albedo", **_):
        albedo = jax.nn.sigmoid(features[..., :3])
        if shading == "albedo" or normal is None or light_positions is None:
            return albedo
        l_dir = light_positions - positions
        l_dir = l_dir / (jnp.linalg.norm(l_dir, axis=-1, keepdims=True) + 1e-8)
        lambert = jnp.maximum(
            jnp.sum(normal * l_dir, axis=-1, keepdims=True), 0.0
        )
        amb = jnp.asarray(self.ambient_light_color, jnp.float32)
        dif = jnp.asarray(self.diffuse_light_color, jnp.float32)
        light = amb + lambert * dif
        if shading == "textureless":
            return jnp.clip(light, 0.0, 1.0)
        return jnp.clip(albedo * light, 0.0, 1.0)
