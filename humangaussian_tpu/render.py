"""Scene-level render API: the reference `render()` contract on pytrees.

Mirrors /root/reference/gaussiansplatting/gaussian_renderer/__init__.py:18-104:
takes a GaussianScene + Camera + background, applies the parameter
activations, rasterizes, and returns the render dict. The reference's
`screenspace_points.retain_grad()` gradient tap (:26-30) becomes an
explicit zero-valued `means2d_offset` argument: differentiate w.r.t. it
to read screen-space gradients for densification (densify.update_stats).
"""
from __future__ import annotations

import jax.numpy as jnp

from humangaussian_tpu.core.camera import Camera
from humangaussian_tpu.core.scene import GaussianScene
from humangaussian_tpu.ops.projection import RasterizeConfig
from humangaussian_tpu.ops.rasterize import rasterize


def render(
    scene: GaussianScene,
    camera: Camera,
    background: jnp.ndarray,
    sh_degree: int | None = None,
    cfg: RasterizeConfig = RasterizeConfig(),
    scale_modifier: float = 1.0,
    means2d_offset: jnp.ndarray | None = None,
    impl: str = "tiled",
    **kwargs,
):
    """Render a scene. Returns {image, depth, alpha, radii, visible, ...}.

    `sh_degree` is the ACTIVE degree (reference active_sh_degree,
    gaussian_model.py:46); defaults to the scene's max degree.
    """
    if sh_degree is None:
        sh_degree = scene.max_sh_degree
    if means2d_offset is None:
        means2d_offset = jnp.zeros((scene.capacity, 2), jnp.float32)
    return rasterize(
        scene.means,
        scene.scales,
        scene.quats,
        scene.features,
        scene.opacities,
        scene.alive,
        camera,
        background,
        sh_degree,
        cfg,
        scale_modifier=scale_modifier,
        means2d_offset=means2d_offset,
        impl=impl,
        **kwargs,
    )
