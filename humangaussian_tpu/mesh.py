"""Gaussian-scene mesh extraction: density field + marching tetrahedra.

Port of the reference's bonus mesh path (gs_renderer.py:240-361:
`extract_fields` evaluates the opacity-weighted Gaussian density on a
128^3 grid block-by-block; `extract_mesh` runs marching cubes via the
external `mcubes` package). Here:

- the field evaluation is ONE batched TPU program: Gaussians are binned
  to spatial blocks on the host (the reference's relaxed-bbox rule,
  gs_renderer.py:287-291), then a vmapped kernel evaluates all blocks'
  [points x gaussians] pairs at once;
- iso-surfacing uses MARCHING TETRAHEDRA (each cell split into 6 tets)
  instead of table-driven marching cubes — no external dependency, no
  256-case tables, same topology guarantees; the threestudio framework
  the reference vendors uses the same tets approach for its DMTet
  isosurface (threestudio/models/isosurface.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.core.scene import GaussianScene, covariance_from_scaling_rotation


def gaussian_3d_coeff(offsets: jnp.ndarray, cov6: jnp.ndarray) -> jnp.ndarray:
    """exp(-0.5 x^T Sigma^-1 x) for packed upper-tri covariances
    (gs_renderer.py gaussian_3d_coeff)."""
    a, b, c, d, e, f = (cov6[..., i] for i in range(6))
    det = a * d * f + 2 * b * c * e - c * c * d - e * e * a - b * b * f
    det = jnp.maximum(det, 1e-24)
    inv_a = (d * f - e * e) / det
    inv_b = (e * c - b * f) / det
    inv_c = (b * e - c * d) / det
    inv_d = (a * f - c * c) / det
    inv_e = (b * c - e * a) / det
    inv_f = (a * d - b * b) / det
    x, y, z = offsets[..., 0], offsets[..., 1], offsets[..., 2]
    power = (
        -0.5 * (x * x * inv_a + y * y * inv_d + z * z * inv_f)
        - x * y * inv_b - x * z * inv_c - y * z * inv_e
    )
    return jnp.exp(jnp.minimum(power, 0.0))


def _pack_cov6(scales, quats):
    cov = covariance_from_scaling_rotation(scales, quats)
    return jnp.stack(
        [cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
         cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]], axis=-1
    )


def extract_density_field(
    scene: GaussianScene,
    resolution: int = 128,
    num_blocks: int = 16,
    relax_ratio: float = 1.5,
    min_opacity: float = 0.005,
    block_capacity: int = 8192,
):
    """[R,R,R] opacity-density field in the normalized [-1,1] cube.

    Returns (field, center, scale) with the normalization used
    (gs_renderer.py:258-264) so vertices can map back to world space.
    """
    alive = np.asarray(scene.alive)
    opac = np.asarray(scene.opacities)[:, 0]
    keep = alive & (opac > min_opacity)
    xyz = np.asarray(scene.means)[keep]
    opas = opac[keep]
    scales = np.asarray(scene.scales)[keep]
    quats = np.asarray(scene.rotations)[keep]

    mn, mx = xyz.min(0), xyz.max(0)
    center = (mn + mx) / 2
    scale = 1.8 / float((mx - mn).max())
    xyz_n = (xyz - center) * scale
    scales_n = scales * scale

    block_size = 2.0 / num_blocks
    split = resolution // num_blocks
    n_blocks3 = num_blocks**3

    # vectorized block membership: a Gaussian joins block k iff its
    # center lies within the block's bounds +- relax (gs_renderer.py:287-291):
    #   k*bs - 1 - relax*bs < c < (k+1)*bs - 1 + relax*bs
    # => k in (floor((c+1)/bs - relax - 1) + 1 .. floor((c+1)/bs + relax))
    u = (xyz_n + 1.0) / block_size  # [M,3]
    lo_k = np.floor(u - relax_ratio).astype(np.int64) + 1
    hi_k = np.floor(u + relax_ratio).astype(np.int64)
    span = int(np.ceil(2 * relax_ratio)) + 1  # offsets per axis
    pair_block, pair_gid = [], []
    m = xyz_n.shape[0]
    gids = np.arange(m, dtype=np.int64)
    for ox in range(span):
        for oy in range(span):
            for oz in range(span):
                k = lo_k + np.array([ox, oy, oz])
                ok = np.all((k >= 0) & (k < num_blocks) & (k <= hi_k), axis=1)
                flat = k[:, 0] * num_blocks**2 + k[:, 1] * num_blocks + k[:, 2]
                pair_block.append(flat[ok])
                pair_gid.append(gids[ok])
    pair_block = np.concatenate(pair_block)
    pair_gid = np.concatenate(pair_gid)
    order = np.argsort(pair_block, kind="stable")
    pair_block, pair_gid = pair_block[order], pair_gid[order]
    starts = np.searchsorted(pair_block, np.arange(n_blocks3 + 1))
    counts = np.minimum(starts[1:] - starts[:-1], block_capacity)
    kmax = max(int(counts.max()), 1)
    k_arange = np.arange(kmax)
    flat_idx = starts[:-1, None] + k_arange[None, :]
    valid = k_arange[None, :] < counts[:, None]
    idx = pair_gid[np.minimum(flat_idx, pair_gid.size - 1)].astype(np.int32)
    idx = np.where(valid, idx, 0)

    cov6 = np.asarray(_pack_cov6(jnp.asarray(scales_n), jnp.asarray(quats)))
    lin = np.linspace(-1.0, 1.0, resolution, dtype=np.float32)

    @jax.jit
    def eval_blocks(idx, valid, xyz_n, cov6, opas):
        def one_block(block_id, gidx, gvalid):
            bx = block_id // num_blocks**2
            by = (block_id // num_blocks) % num_blocks
            bz = block_id % num_blocks
            xs = jax.lax.dynamic_slice(jnp.asarray(lin), (bx * split,), (split,))
            ys = jax.lax.dynamic_slice(jnp.asarray(lin), (by * split,), (split,))
            zs = jax.lax.dynamic_slice(jnp.asarray(lin), (bz * split,), (split,))
            xx, yy, zz = jnp.meshgrid(xs, ys, zs, indexing="ij")
            pts = jnp.stack([xx, yy, zz], axis=-1).reshape(-1, 3)  # [S,3]
            g_xyz = xyz_n[gidx]
            g_cov = cov6[gidx]
            g_opa = jnp.where(gvalid, opas[gidx], 0.0)
            off = pts[:, None, :] - g_xyz[None, :, :]  # [S,K,3]
            w = gaussian_3d_coeff(off, g_cov[None])  # [S,K]
            return jnp.sum(w * g_opa[None, :], axis=1)  # [S]

        ids = jnp.arange(n_blocks3, dtype=jnp.int32)
        return jax.lax.map(
            lambda args: one_block(*args), (ids, idx, valid)
        )

    vals = np.asarray(
        eval_blocks(
            jnp.asarray(idx), jnp.asarray(valid), jnp.asarray(xyz_n),
            jnp.asarray(cov6), jnp.asarray(opas),
        )
    )  # [B3, S]
    field = np.zeros((resolution,) * 3, np.float32)
    for i in range(n_blocks3):
        bx = i // num_blocks**2
        by = (i // num_blocks) % num_blocks
        bz = i % num_blocks
        field[
            bx * split : (bx + 1) * split,
            by * split : (by + 1) * split,
            bz * split : (bz + 1) * split,
        ] = vals[i].reshape(split, split, split)
    return field, center, scale


# 6-tetrahedra decomposition of a cube (corner ids, binary xyz order)
_TETS = np.array(
    [[0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
     [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6]],
    np.int64,
)
_CORNER_OFFSET = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
     [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]],
    np.int64,
)


def marching_tetrahedra(field: np.ndarray, threshold: float):
    """Iso-surface of a dense [X,Y,Z] field via marching tets.

    Returns (vertices [V,3] in grid coordinates, triangles [F,3]).
    """
    res = np.asarray(field.shape)
    gx, gy, gz = np.meshgrid(
        np.arange(res[0] - 1), np.arange(res[1] - 1), np.arange(res[2] - 1),
        indexing="ij",
    )
    base = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)  # [C,3]

    corner_pos = base[:, None, :] + _CORNER_OFFSET[None]  # [C,8,3]
    corner_val = field[
        corner_pos[..., 0], corner_pos[..., 1], corner_pos[..., 2]
    ]  # [C,8]

    verts_out = []
    tris_out = []
    n_verts = 0
    for tet in _TETS:
        p = corner_pos[:, tet, :].astype(np.float64)  # [C,4,3]
        v = corner_val[:, tet]  # [C,4]
        inside = v > threshold  # [C,4]
        code = (
            inside[:, 0] * 1 + inside[:, 1] * 2
            + inside[:, 2] * 4 + inside[:, 3] * 8
        )

        def edge_point(sel, i, j):
            vi, vj = v[sel, i], v[sel, j]
            t = (threshold - vi) / np.where(vj - vi == 0, 1.0, vj - vi)
            t = np.clip(t, 0.0, 1.0)[:, None]
            return p[sel, i] * (1 - t) + p[sel, j] * t

        # single-corner cases (1 triangle): corner k inside (or outside)
        for k in range(4):
            others = [i for i in range(4) if i != k]
            for c_val in (1 << k, 15 ^ (1 << k)):
                sel = np.nonzero(code == c_val)[0]
                if sel.size == 0:
                    continue
                tri = np.stack(
                    [edge_point(sel, k, o) for o in others], axis=1
                )  # [S,3,3]
                verts_out.append(tri.reshape(-1, 3))
                tris_out.append(
                    np.arange(sel.size * 3).reshape(-1, 3) + n_verts
                )
                n_verts += sel.size * 3

        # two-corner cases (quad -> 2 triangles)
        for pair in ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)):
            c_val = (1 << pair[0]) | (1 << pair[1])
            sel = np.nonzero(code == c_val)[0]
            if sel.size == 0:
                continue
            a, b = pair
            c, d = [i for i in range(4) if i not in pair]
            # crossing edges: a-c, a-d, b-c, b-d
            pac = edge_point(sel, a, c)
            pad = edge_point(sel, a, d)
            pbc = edge_point(sel, b, c)
            pbd = edge_point(sel, b, d)
            quad = np.stack([pac, pad, pbd, pbc], axis=1)  # [S,4,3]
            verts_out.append(quad.reshape(-1, 3))
            t1 = np.stack(
                [np.arange(sel.size) * 4, np.arange(sel.size) * 4 + 1,
                 np.arange(sel.size) * 4 + 2], axis=1,
            )
            t2 = np.stack(
                [np.arange(sel.size) * 4, np.arange(sel.size) * 4 + 2,
                 np.arange(sel.size) * 4 + 3], axis=1,
            )
            tris_out.append(np.concatenate([t1, t2]) + n_verts)
            n_verts += sel.size * 4

    if not verts_out:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
    verts = np.concatenate(verts_out).astype(np.float32)
    tris = np.concatenate(tris_out)

    # weld duplicate vertices
    keys = np.round(verts * 1e4).astype(np.int64)
    _, first, inv = np.unique(
        keys, axis=0, return_index=True, return_inverse=True
    )
    return verts[first], inv[tris]


def extract_mesh(
    scene: GaussianScene,
    density_thresh: float = 1.0,
    resolution: int = 128,
):
    """Gaussians -> (vertices [V,3] world space, triangles [F,3]);
    gs_renderer.py:333-361 minus the pymeshlab decimation."""
    field, center, scale = extract_density_field(scene, resolution)
    verts, tris = marching_tetrahedra(field, density_thresh)
    verts = verts / (resolution - 1.0) * 2.0 - 1.0
    verts = verts / scale + center
    return verts.astype(np.float32), tris.astype(np.int32)


def save_obj(path: str, verts: np.ndarray, tris: np.ndarray) -> str:
    import os

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for t in tris:
            f.write(f"f {t[0] + 1} {t[1] + 1} {t[2] + 1}\n")
    return path
