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


class NeuralRadianceMaterial(nn.Module):
    """neural-radiance-material: MLP(features ++ encoded viewdir) ->
    sigmoid color (neural_radiance_material.py)."""

    n_frequencies: int = 4
    n_neurons: int = 32
    n_hidden_layers: int = 2

    @nn.compact
    def __call__(self, features, viewdirs=None, **_):
        from humangaussian_tpu.nerf.encoding import FrequencyEncoding
        from humangaussian_tpu.nerf.geometry import VanillaMLP

        if viewdirs is None:
            viewdirs = jnp.zeros(features.shape[:-1] + (3,))
        d = viewdirs / (
            jnp.linalg.norm(viewdirs, axis=-1, keepdims=True) + 1e-8
        )
        enc = FrequencyEncoding(self.n_frequencies)(d)
        h = jnp.concatenate([features, enc], axis=-1)
        rgb = VanillaMLP(3, self.n_neurons, self.n_hidden_layers)(h)
        return jax.nn.sigmoid(rgb)


class PBRMaterial(nn.Module):
    """pbr-material, simplified Cook-Torrance (pbr_material.py): the
    feature vector parameterizes (albedo 3, metallic 1, roughness 1);
    shading = diffuse + GGX-ish specular under a point light."""

    min_metallic: float = 0.0
    max_metallic: float = 0.9
    min_roughness: float = 0.08
    max_roughness: float = 0.9

    @nn.compact
    def __call__(self, features, positions=None, normal=None,
                 light_positions=None, viewdirs=None, **_):
        albedo = jax.nn.sigmoid(features[..., :3])
        metallic = self.min_metallic + (
            self.max_metallic - self.min_metallic
        ) * jax.nn.sigmoid(features[..., 3:4])
        roughness = self.min_roughness + (
            self.max_roughness - self.min_roughness
        ) * jax.nn.sigmoid(features[..., 4:5])
        if normal is None or light_positions is None or positions is None:
            return albedo
        l = light_positions - positions
        l = l / (jnp.linalg.norm(l, axis=-1, keepdims=True) + 1e-8)
        v = (
            -viewdirs if viewdirs is not None else l
        )
        h = l + v
        h = h / (jnp.linalg.norm(h, axis=-1, keepdims=True) + 1e-8)
        ndl = jnp.maximum(jnp.sum(normal * l, -1, keepdims=True), 0.0)
        ndv = jnp.maximum(jnp.sum(normal * v, -1, keepdims=True), 0.0)
        ndh = jnp.maximum(jnp.sum(normal * h, -1, keepdims=True), 0.0)
        vdh = jnp.maximum(jnp.sum(v * h, -1, keepdims=True), 0.0)
        # full Cook-Torrance (pbr_material.py / nvdiffrec bsdf): GGX
        # distribution D, Fresnel-Schlick F, Smith-GGX geometry G
        a2 = roughness**4
        dist = a2 / (jnp.pi * ((ndh**2) * (a2 - 1.0) + 1.0) ** 2 + 1e-6)
        f0 = 0.04 * (1 - metallic) + albedo * metallic
        fresnel = f0 + (1.0 - f0) * (1.0 - vdh) ** 5

        def g1(ndx):
            return 2.0 * ndx / (
                ndx + jnp.sqrt(a2 + (1.0 - a2) * ndx**2) + 1e-8
            )

        geom = g1(ndl) * g1(ndv)
        spec = dist * fresnel * geom / (4.0 * ndl * ndv + 1e-6) * ndl
        # energy-conserving diffuse: the Fresnel-reflected fraction does
        # not also scatter diffusely
        kd = (1.0 - fresnel) * (1.0 - metallic)
        diffuse = kd * albedo * ndl
        return jnp.clip(diffuse + spec, 0.0, 1.0)


class SDLatentAdapterMaterial(nn.Module):
    """sd-latent-adapter-material (sd_latent_adapter_material.py): a
    learned 4->3 linear adapter mapping SD latent features to RGB,
    initialized to the well-known latent->RGB preview matrix."""

    @nn.compact
    def __call__(self, features, **_):
        init = jnp.asarray(
            [
                [0.298, 0.207, 0.208],
                [0.187, 0.286, 0.173],
                [-0.158, 0.189, 0.264],
                [-0.184, -0.271, -0.473],
            ],
            jnp.float32,
        )
        adapter = self.param("adapter", lambda *_: init, (4, 3))
        color = features[..., :4] @ adapter
        return jnp.clip((color + 1.0) * 0.5, 0.0, 1.0)


class HybridRGBLatentMaterial(nn.Module):
    """hybrid-rgb-latent-material (hybrid_rgb_latent_material.py): the
    first 3 feature dims are activated as RGB, the remaining latent
    dims pass through unchanged."""

    n_output_dims: int = 3
    color_activation: str = "sigmoid"

    @nn.compact
    def __call__(self, features, **_):
        rgb = features[..., :3]
        rgb = (
            jax.nn.sigmoid(rgb)
            if self.color_activation == "sigmoid"
            else jnp.clip(rgb, 0.0, 1.0)
        )
        return jnp.concatenate([rgb, features[..., 3:]], axis=-1)
