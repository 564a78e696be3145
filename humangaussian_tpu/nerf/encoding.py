"""Input encodings for implicit fields, pure JAX.

Replaces the tiny-cuda-nn encodings the reference requests through
`get_encoding` (/root/reference/threestudio/models/networks.py): the
NeRF frequency encoding and the Instant-NGP multiresolution hash grid
(Mueller et al. 2022). The hash grid is the TPU-native analogue of
tcnn's CUDA kernels: per level, the 8 corner lookups are one wide-row
gather from the level's [T, F] table and the trilinear blend is fused
VPU arithmetic. Gathers dominate; for SDS-scale batches (tens of
thousands of samples x 16 levels) this is a ~ms-class op, not a
bottleneck against the diffusion prior.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# the three large primes of the Instant-NGP spatial hash
_PRIMES = (1, 2654435761, 805459861)


class FrequencyEncoding(nn.Module):
    """NeRF sin/cos encoding: [.., D] -> [.., 2*D*n_frequencies]."""

    n_frequencies: int = 6

    @nn.compact
    def __call__(self, x):
        freqs = 2.0 ** jnp.arange(self.n_frequencies, dtype=jnp.float32)
        xb = x[..., None, :] * freqs[:, None]  # [.., L, D]
        enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)
        return enc.reshape(x.shape[:-1] + (-1,))

    @property
    def n_output_dims(self):
        return 2 * 3 * self.n_frequencies


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    """tcnn HashGrid defaults as the reference configures them
    (configs' pos_encoding_config: otype HashGrid, n_levels 16,
    n_features_per_level 2, log2_hashmap_size 19, base_resolution 16,
    per_level_scale ~1.447)."""

    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 1.4472692374403782


class HashGridEncoding(nn.Module):
    """Multiresolution hash grid over [0,1]^3 inputs."""

    cfg: HashGridConfig = HashGridConfig()

    @property
    def n_output_dims(self):
        return self.cfg.n_levels * self.cfg.n_features_per_level

    @nn.compact
    def __call__(self, x):
        """x: [.., 3] in [0, 1] -> [.., n_levels * F]."""
        c = self.cfg
        t_size = 1 << c.log2_hashmap_size
        table = self.param(
            "table",
            lambda key: jax.random.uniform(
                key, (c.n_levels, t_size, c.n_features_per_level),
                jnp.float32, -1e-4, 1e-4,
            ),
        )
        lead = x.shape[:-1]
        pts = x.reshape(-1, 3)

        # corner offsets [8, 3]
        corners = jnp.stack(
            jnp.meshgrid(*([jnp.arange(2)] * 3), indexing="ij"), axis=-1
        ).reshape(8, 3)

        def level(li):
            res = jnp.floor(
                c.base_resolution * c.per_level_scale**li
            ).astype(jnp.int32)
            p = pts * (res.astype(jnp.float32) - 1.0)
            p0 = jnp.floor(p).astype(jnp.int32)
            frac = p - p0
            idx = p0[:, None, :] + corners[None, :, :]  # [P, 8, 3]
            idx = jnp.clip(idx, 0, res - 1)
            # spatial hash (Instant-NGP eq. 4) in uint32 (the primes
            # overflow int32; wraparound is part of the hash)
            u = idx.astype(jnp.uint32)
            h = (
                u[..., 0] * jnp.uint32(_PRIMES[0])
                ^ u[..., 1] * jnp.uint32(_PRIMES[1])
                ^ u[..., 2] * jnp.uint32(_PRIMES[2])
            ) & jnp.uint32(t_size - 1)
            h = h.astype(jnp.int32)
            feats = table[li][h.reshape(-1)].reshape(
                pts.shape[0], 8, c.n_features_per_level
            )
            w = jnp.prod(
                jnp.where(corners[None] == 1, frac[:, None, :],
                          1.0 - frac[:, None, :]),
                axis=-1,
            )  # [P, 8]
            return jnp.sum(feats * w[..., None], axis=1)  # [P, F]

        outs = [level(li) for li in range(c.n_levels)]
        out = jnp.concatenate(outs, axis=-1)
        return out.reshape(lead + (self.n_output_dims,))
