"""HumanGaussian-TPU: a TPU-native (JAX/XLA/Pallas) text-to-3D-human framework.

A from-scratch re-design of the capabilities of alvinliu0/HumanGaussian
(text -> 3D Gaussian-splat avatar via Structure-Aware SDS against a
dual-branch RGBxDepth diffusion prior, plus zero-shot SMPL-X animation),
built TPU-first:

- differentiable 3D Gaussian rasterization as fused XLA/Pallas programs
  (log-transmittance compositing, exact CUDA-reference semantics),
- fixed-capacity padded Gaussian scenes -> recompile-free densify/prune,
- pjit/shard_map tile + camera sharding over device meshes,
- Flax dual-branch UNet + VAE guidance, pure-function camera curriculum.
"""

__version__ = "0.1.0"

# subsystem re-exports (lazy-import-friendly: core pieces only)
from humangaussian_tpu.core.scene import GaussianScene, empty_scene, scene_from_points
from humangaussian_tpu.render import render
from humangaussian_tpu.densify import (
    densify_and_prune,
    prune_only,
    update_stats,
    init_densify_state,
)
from humangaussian_tpu.io.ply import save_ply, load_ply
from humangaussian_tpu.registry import register, find
