"""Mesh exporter with texture baking (obj + mtl + png).

TPU/CPU-native port of
/root/reference/threestudio/models/exporters/mesh_exporter.py: the
reference extracts an isosurface, UV-unwraps with xatlas, and bakes the
material by rasterizing UVs with nvdiffrast (CUDA/OpenGL). Here:

- isosurface from the implicit volume via the in-repo marching
  tetrahedra (humangaussian_tpu.mesh.marching_tetrahedra — the same
  dependency-free kernel the Gaussian->mesh path uses);
- UV unwrap by per-face atlas packing: each triangle gets its own
  right-triangle cell in a sqrt(F) x sqrt(F) grid (no xatlas
  dependency; chart quality is traded for determinism and zero native
  deps — the bake is per-face so no bleeding across charts);
- albedo bake by evaluating geometry features + material at the
  world-space point of every texel (batched JAX query, not a
  rasterizer).

Exports: save_mesh_obj(dir, ...) -> model.obj + model.mtl +
texture_kd.png (the reference's artifact set, mesh_exporter.py:95-175).
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


def per_face_uv_atlas(n_faces: int, texture_size: int):
    """Assign each face a half-cell in a grid atlas. Returns (uvs
    [3F, 2] in [0,1], uv_faces [F, 3] indices into uvs)."""
    cells = int(np.ceil(np.sqrt(n_faces)))
    cell = 1.0 / cells
    pad = cell * 0.08
    uvs = np.zeros((n_faces, 3, 2), np.float32)
    for f in range(n_faces):
        cy, cx = divmod(f, cells)
        x0, y0 = cx * cell + pad, cy * cell + pad
        x1, y1 = (cx + 1) * cell - pad, (cy + 1) * cell - pad
        uvs[f] = [(x0, y0), (x1, y0), (x0, y1)]
    uv_flat = uvs.reshape(-1, 2)
    uv_faces = np.arange(3 * n_faces, dtype=np.int32).reshape(-1, 3)
    return uv_flat, uv_faces


def bake_albedo(verts, faces, query_color_fn, texture_size: int = 1024):
    """Bake per-texel albedo: for each texel covered by a face's UV
    cell, evaluate `query_color_fn(points [N,3]) -> [N,3]` at the
    corresponding world position. Returns (texture [S,S,3] float,
    uv_flat, uv_faces)."""
    n_faces = faces.shape[0]
    uv_flat, uv_faces = per_face_uv_atlas(n_faces, texture_size)
    s = texture_size
    tex = np.full((s, s, 3), 0.5, np.float32)

    # texel centers per face cell: sample a K x K barycentric lattice
    k = max(2, int(np.ceil(s / np.ceil(np.sqrt(n_faces)))) + 1)
    bi, bj = np.meshgrid(np.linspace(0, 1, k), np.linspace(0, 1, k))
    mask = bi + bj <= 1.0 + 1e-6
    ba = np.stack([1 - bi[mask] - bj[mask], bi[mask], bj[mask]], -1)  # [M,3]

    tri = verts[faces]  # [F,3,3]
    pts = np.einsum("ms,fsd->fmd", ba, tri).reshape(-1, 3)
    cols = np.asarray(query_color_fn(jnp.asarray(pts))).reshape(
        n_faces, -1, 3
    )

    uv_tri = uv_flat[uv_faces]  # [F,3,2]
    uv_pts = np.einsum("ms,fst->fmt", ba, uv_tri)  # [F,M,2]
    xi = np.clip((uv_pts[..., 0] * s).astype(int), 0, s - 1)
    yi = np.clip((uv_pts[..., 1] * s).astype(int), 0, s - 1)
    tex[yi.reshape(-1), xi.reshape(-1)] = cols.reshape(-1, 3)
    return tex, uv_flat, uv_faces


def save_mesh_obj(
    save_dir: str,
    verts: np.ndarray,
    faces: np.ndarray,
    query_color_fn=None,
    texture_size: int = 1024,
    name: str = "model",
) -> str:
    """obj + mtl (+ baked texture) artifact set (mesh_exporter.py:95-175)."""
    os.makedirs(save_dir, exist_ok=True)
    obj_path = os.path.join(save_dir, f"{name}.obj")
    mtl_path = os.path.join(save_dir, f"{name}.mtl")
    lines = [f"mtllib {name}.mtl", "usemtl default"]
    for v in np.asarray(verts):
        lines.append(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}")

    tex_line = ""
    if query_color_fn is not None:
        tex, uv_flat, uv_faces = bake_albedo(
            np.asarray(verts), np.asarray(faces), query_color_fn,
            texture_size,
        )
        from PIL import Image

        tex_path = os.path.join(save_dir, "texture_kd.png")
        Image.fromarray(
            (np.clip(tex, 0, 1) * 255).astype(np.uint8)
        ).save(tex_path)
        tex_line = "map_Kd texture_kd.png"
        for uv in uv_flat:
            lines.append(f"vt {uv[0]:.6f} {1.0 - uv[1]:.6f}")
        for f, uvf in zip(np.asarray(faces), uv_faces):
            lines.append(
                "f "
                + " ".join(f"{f[i] + 1}/{uvf[i] + 1}" for i in range(3))
            )
    else:
        for f in np.asarray(faces):
            lines.append(f"f {f[0] + 1} {f[1] + 1} {f[2] + 1}")

    with open(obj_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    with open(mtl_path, "w") as fh:
        fh.write(
            "newmtl default\nKa 0.0 0.0 0.0\nKd 0.8 0.8 0.8\n"
            "Ks 0.0 0.0 0.0\n" + tex_line + "\n"
        )
    return obj_path


def export_implicit_volume(
    save_dir: str,
    geometry,
    params,
    material=None,
    material_params=None,
    resolution: int = 64,
    threshold: float = 10.0,
    radius: float = 1.0,
    texture_size: int = 512,
):
    """mesh-exporter for the NeRF stack: isosurface the density field,
    bake the material color, write obj/mtl/png."""
    import jax

    from humangaussian_tpu.mesh import marching_tetrahedra

    lin = np.linspace(-radius, radius, resolution, dtype=np.float32)
    gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
    pts = jnp.asarray(
        np.stack([gx, gy, gz], -1).reshape(-1, 3)
    )
    dens = np.asarray(
        jax.jit(lambda p: geometry.apply(params, p)["density"])(pts)
    ).reshape(resolution, resolution, resolution)
    verts_idx, faces = marching_tetrahedra(dens, threshold)
    # grid-index space -> world
    verts = verts_idx / (resolution - 1) * 2 * radius - radius

    def color_fn(p):
        out = geometry.apply(params, p)
        feats = out["features"]
        if material is not None:
            return material.apply(material_params, feats)
        return jax.nn.sigmoid(feats[..., :3])

    return save_mesh_obj(
        save_dir, verts, faces, color_fn, texture_size=texture_size
    )
