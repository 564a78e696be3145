"""Tile binning: (tile, Gaussian) pair lists for the tiled rasterizer.

TPU-native replacement for the CUDA rasterizer's duplicate-and-radix-sort
binning stage (diff-gaussian-rasterization forward: duplicateWithKeys +
cub radix sort by (tile | depth) key, called from
/root/reference/gaussiansplatting/gaussian_renderer/__init__.py:86-94).

The CUDA version builds dynamically-sized per-tile ranges. On TPU every
shape must be static, so binning produces a fixed-capacity slot table:

  slots  [T, K] int32  Gaussian index per (tile, depth-rank) slot, -1 pad
  counts [T]    int32  live slots per tile (<= K)

built from three static-shaped passes:
  1. depth-sort the N (padded) Gaussians (visible first);
  2. expand each Gaussian's tile rect into `rect_side**2` candidate pairs
     (invalid pairs get a sentinel tile id that sorts last);
  3. stable-sort pairs by tile id — stability preserves the global depth
     order within each tile — and scatter into the slot table.

Pairs beyond K for a given tile are dropped deepest-first (they sit
behind K closer Gaussians; with K=4096 and front-to-back saturation this
is visually nil) and reported in `overflow` so callers can monitor.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from humangaussian_tpu.ops.projection import ProjectedGaussians, RasterizeConfig


class TileBins(NamedTuple):
    slots: jnp.ndarray  # [T, K] int32, -1 = empty
    counts: jnp.ndarray  # [T] int32
    overflow: jnp.ndarray  # [] int32: pairs dropped due to the K cap


def depth_order(visible: jnp.ndarray, depths: jnp.ndarray) -> jnp.ndarray:
    """Indices sorted by view depth, invisible Gaussians last.

    Ties broken by index (the CUDA radix sort over (tile|depth) keys is
    stable in duplication order, which is index order).
    """
    n = depths.shape[0]
    key = jnp.where(visible, depths, jnp.inf)
    _, order = jax.lax.sort(
        (key, jnp.arange(n, dtype=jnp.int32)), num_keys=1, is_stable=True
    )
    return order


def build_tile_bins(
    prims: ProjectedGaussians,
    tiles_x: int,
    tiles_y: int,
    capacity: int,
    cfg: RasterizeConfig,
) -> TileBins:
    """Bin projected Gaussians into per-tile, depth-ordered slot lists."""
    n = prims.depths.shape[0]
    num_tiles = tiles_x * tiles_y
    side = cfg.rect_side
    r = side * side

    order = depth_order(prims.visible, prims.depths)
    rect = prims.rect[order]  # [N,4] x0,y0,x1,y1 (tile units)
    vis = prims.visible[order]

    # expand rect -> candidate tiles [N, side, side]
    dy = jnp.arange(side, dtype=jnp.int32)
    dx = jnp.arange(side, dtype=jnp.int32)
    ty = rect[:, 1, None, None] + dy[None, :, None]  # [N, side, 1]
    tx = rect[:, 0, None, None] + dx[None, None, :]  # [N, 1, side]
    in_rect = (ty < rect[:, 3, None, None]) & (tx < rect[:, 2, None, None])
    valid = in_rect & vis[:, None, None]
    tile_id = jnp.where(valid, ty * tiles_x + tx, num_tiles)  # sentinel last

    p = n * r
    pair_tile = tile_id.reshape(p)
    pair_gid = jnp.broadcast_to(order[:, None, None], (n, side, side)).reshape(p)

    # stable sort by tile keeps depth-major order within each tile
    sorted_tile, sorted_gid = jax.lax.sort(
        (pair_tile, pair_gid), num_keys=1, is_stable=True
    )

    starts = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    seg_len = starts[1:] - starts[:-1]  # [T]
    counts = jnp.minimum(seg_len, capacity)
    overflow = jnp.sum(jnp.maximum(seg_len - capacity, 0))

    # realize the [T, K] table as a GATHER from the sorted pair list
    # (slots[t, k] = sorted_gid[starts[t] + k]) — a scatter formulation
    # is semantically identical but orders of magnitude slower on TPU
    k_idx = jnp.arange(capacity, dtype=jnp.int32)
    flat = starts[:-1, None] + k_idx[None, :]  # [T, K]
    valid = k_idx[None, :] < counts[:, None]
    slots = jnp.where(
        valid, sorted_gid[jnp.minimum(flat, p - 1)], -1
    )
    return TileBins(slots=slots, counts=counts, overflow=overflow)
