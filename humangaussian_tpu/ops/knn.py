"""Mean squared distance to the 3 nearest neighbors, for scene init.

TPU-native replacement for the vendored `simple-knn` CUDA extension
(/root/reference/gaussiansplatting/submodules/simple-knn/simple_knn.cu,
used via distCUDA2 at gaussian_model.py:134): Morton-order the points,
then search a fixed window of sorted neighbors — the same
locality-by-space-filling-curve idea as the CUDA kernel's 1024-point
boxes, but as two XLA sorts plus a vectorized windowed scan instead of
warp scans. Runs once per scene init (N ~ 1e5), so the O(N * window)
vectorized pass is ample.

The windowed search is approximate for adversarial inputs (simple-knn
adds an exact box-rejection pass); on surface-sampled point clouds a
window of 64 recovers the exact 3-NN essentially always, and the result
only seeds initial log-scales (reference gaussian_model.py:135-138).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread 10 bits to every 3rd bit (Morton), uint32 in/out."""
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton_codes(points: jnp.ndarray) -> jnp.ndarray:
    """10-bit-per-axis 3D Morton codes (same scheme as simple_knn.cu:45-61)."""
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    scale = 1023.0 / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((points - lo) * scale, 0.0, 1023.0).astype(jnp.uint32)
    return (
        (_expand_bits(q[:, 0]) << 2)
        | (_expand_bits(q[:, 1]) << 1)
        | _expand_bits(q[:, 2])
    )


def _windowed_candidates(points: jnp.ndarray, perm: tuple, window: int):
    """One Morton ordering of the axis-permuted points -> per point, the
    squared distances [N, 2W] and global indices [N, 2W] of its window
    neighbors (distances computed in original space)."""
    n = points.shape[0]
    codes = morton_codes(points[:, jnp.array(perm)])
    _, order = jax.lax.sort(
        (codes, jnp.arange(n, dtype=jnp.int32)), num_keys=1
    )
    sorted_pts = points[order]

    offs = jnp.concatenate(
        [jnp.arange(-window, 0), jnp.arange(1, window + 1)]
    )  # [2W]
    idx = jnp.arange(n)[:, None] + offs[None, :]
    valid = (idx >= 0) & (idx < n)
    idx = jnp.clip(idx, 0, n - 1)
    neigh = sorted_pts[idx]  # [N, 2W, 3]
    d2 = jnp.sum((neigh - sorted_pts[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(valid, d2, jnp.inf)
    gidx = jnp.where(valid, order[idx], -1)
    # un-permute rows back to input order
    inv = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return d2[inv], gidx[inv]


@functools.partial(jax.jit, static_argnames=("window", "k"))
def mean_knn_sq_dist(
    points: jnp.ndarray, window: int = 48, k: int = 3
) -> jnp.ndarray:
    """[N,3] points -> [N] mean squared distance to the k nearest neighbors.

    Unions candidates from three axis-permuted Morton orderings — points
    split across a cell boundary in one curve are adjacent in another,
    which recovers the exactness simple-knn gets from its box-rejection
    rescan (simple_knn.cu:147-183). Candidates are deduplicated by
    neighbor index so a neighbor found by several curves counts once.
    """
    ds, idxs = zip(
        *[
            _windowed_candidates(points, perm, window)
            for perm in ((0, 1, 2), (1, 2, 0), (2, 0, 1))
        ]
    )
    d2 = jnp.concatenate(ds, axis=1)  # [N, 6W]
    gidx = jnp.concatenate(idxs, axis=1)

    # dedupe: sort each row by neighbor index, mask repeats
    gidx_s, d2_s = jax.lax.sort((gidx, d2), num_keys=1, dimension=1)
    dup = jnp.concatenate(
        [jnp.zeros((d2.shape[0], 1), bool), gidx_s[:, 1:] == gidx_s[:, :-1]],
        axis=1,
    )
    d2_s = jnp.where(dup | (gidx_s < 0), jnp.inf, d2_s)

    smallest = -jax.lax.top_k(-d2_s, k)[0]  # [N, k]
    smallest = jnp.where(jnp.isfinite(smallest), smallest, 0.0)
    return jnp.mean(smallest, axis=-1)


def mean_3nn_sq_dist_host(points) -> "jnp.ndarray":
    """Exact distCUDA2 equivalent on the host via a KD-tree.

    Scene init is a one-time host-side event (like the reference's CPU
    trimesh sampling feeding the CUDA distCUDA2, GaussianDreamer.py:220-232),
    so an exact O(N log N) KD-tree query is the right tool; the windowed
    on-device variant above exists for fully-jitted pipelines.
    """
    import numpy as np
    from scipy.spatial import cKDTree

    pts = np.asarray(points, np.float32)
    d, _ = cKDTree(pts).query(pts, k=4)  # self + 3 neighbors
    return jnp.asarray((d[:, 1:] ** 2).mean(axis=1), jnp.float32)


def mean_3nn_sq_dist(points: jnp.ndarray, window: int = 64) -> jnp.ndarray:
    """distCUDA2 equivalent (simple-knn ext.cpp/spatial.cu contract).

    On-device windowed approximation (errors, when the window misses a
    neighbor, only overestimate); use mean_3nn_sq_dist_host for the exact
    one-time init path.
    """
    return mean_knn_sq_dist(points, window=window, k=3)
