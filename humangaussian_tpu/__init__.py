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
