"""Explicit geometries + mesh rasterization renderers.

TPU-native ports of the remaining threestudio stock components
(SURVEY.md §2.8):

- `tetrahedra-sdf-grid`
  (/root/reference/threestudio/models/geometry/tetrahedra_sdf_grid.py):
  learned per-vertex SDF + deformation on a regular tetrahedral grid,
  DIFFERENTIABLE marching tetrahedra -> triangle mesh. The reference
  loads a precomputed tet file (load/tets/*.npz) and runs a CUDA
  marching-tets kernel (models/isosurface.py); here the grid is the
  six-tets-per-cube decomposition of a regular lattice and the
  extraction is static-shape JAX: every tet emits exactly two (possibly
  degenerate) triangles, so the whole isosurface is one fused XLA
  program and gradients flow to sdf values and deformations (the DMTet
  training signal).
- `custom-mesh` (geometry/custom_mesh.py): a FIXED triangle mesh with a
  learned feature field (encoding + MLP) queried at surface points.
- `nvdiff-rasterizer` (renderers/nvdiff_rasterizer.py): mesh
  rasterization with interpolated attributes. nvdiffrast is a
  CUDA/OpenGL dependency; the TPU replacement scans face chunks against
  the pixel grid with a z-buffer carry (dense [pixels, chunk]
  barycentric tests -> VPU-friendly), then re-derives barycentrics for
  the winning face differentiably so vertex positions/attributes get
  gradients, which is the nvdiffrast `rasterize`+`interpolate` contract
  (minus antialiasing).
- `patch-renderer` (renderers/patch_renderer.py): global low-res render
  + one random full-res patch, composed over any base renderer.
- `DeferredVolumeRenderer` (renderers/deferred_volume_renderer.py): the
  reference class is literally `pass`; aliased to the NeRF renderer.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.nerf.encoding import (
    FrequencyEncoding,
    HashGridConfig,
    HashGridEncoding,
)
from humangaussian_tpu.nerf.geometry import VanillaMLP

# ---------------------------------------------------------------------------
# regular tetrahedral grid (six tets per cube)
# ---------------------------------------------------------------------------

# cube corner offsets indexed 0..7 as (dx, dy, dz) bit triples
_CUBE_TETS = np.array(
    [  # standard 6-tet decomposition sharing the 0-7 diagonal
        [0, 5, 1, 7],
        [0, 1, 3, 7],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
        [0, 4, 5, 7],
    ],
    np.int32,
)

# the 6 edges of a tet as vertex-index pairs
_TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int32
)

# marching-tets triangle table: for each of the 16 sign configs
# (bit i = sdf[v_i] < 0), up to 2 triangles of edge indices, -1 = unused.
# Orientation consistent within each config (winding not normalized —
# downstream rendering treats faces as double-sided, like the reference
# marching tets consumer).
_MT_TABLE = np.full((16, 2, 3), -1, np.int32)
_MT_TABLE[0b0001, 0] = [0, 1, 2]
_MT_TABLE[0b1110, 0] = [0, 2, 1]
_MT_TABLE[0b0010, 0] = [0, 4, 3]
_MT_TABLE[0b1101, 0] = [0, 3, 4]
_MT_TABLE[0b0100, 0] = [1, 3, 5]
_MT_TABLE[0b1011, 0] = [1, 5, 3]
_MT_TABLE[0b1000, 0] = [2, 5, 4]
_MT_TABLE[0b0111, 0] = [2, 4, 5]
_MT_TABLE[0b0011] = [[1, 2, 4], [1, 4, 3]]
_MT_TABLE[0b1100] = [[1, 4, 2], [1, 3, 4]]
_MT_TABLE[0b0101] = [[0, 3, 5], [0, 5, 2]]
_MT_TABLE[0b1010] = [[0, 5, 3], [0, 2, 5]]
_MT_TABLE[0b0110] = [[0, 1, 5], [0, 5, 4]]
_MT_TABLE[0b1001] = [[0, 5, 1], [0, 4, 5]]


def tet_grid(resolution: int):
    """Vertices [(R+1)^3, 3] in [0,1]^3 and tets [6*R^3, 4] (int32)."""
    r = resolution
    lin = np.arange(r + 1, dtype=np.float32) / r
    gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
    verts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)

    def vid(ix, iy, iz):
        return (ix * (r + 1) + iy) * (r + 1) + iz

    cx, cy, cz = np.meshgrid(
        np.arange(r), np.arange(r), np.arange(r), indexing="ij"
    )
    corners = []
    for c in range(8):
        dx, dy, dz = (c >> 2) & 1, (c >> 1) & 1, c & 1
        corners.append(vid(cx + dx, cy + dy, cz + dz).reshape(-1))
    corners = np.stack(corners, axis=1)  # [R^3, 8]
    tets = corners[:, _CUBE_TETS].reshape(-1, 4)  # [6*R^3, 4]
    return verts.astype(np.float32), tets.astype(np.int32)


def marching_tets(verts, sdf, tets):
    """Differentiable marching tetrahedra with static shapes.

    verts [V,3] (float, possibly deformed), sdf [V], tets [T,4] ->
    (tri_verts [T*2, 3, 3], tri_mask [T*2] bool). Every tet contributes
    exactly two triangle slots; unused slots are degenerate (all-zero)
    and masked. Edge intersection p = (s_b * v_a - s_a * v_b)/(s_b - s_a)
    gives d(p)/d(sdf) — the DMTet gradient path
    (tetrahedra_sdf_grid.py isosurface())."""
    tv = verts[tets]  # [T,4,3]
    ts = sdf[tets]  # [T,4]
    occ = (ts < 0).astype(jnp.int32)
    config = (
        occ[:, 0] | (occ[:, 1] << 1) | (occ[:, 2] << 2) | (occ[:, 3] << 3)
    )  # [T]

    ea, eb = _TET_EDGES[:, 0], _TET_EDGES[:, 1]
    sa, sb = ts[:, ea], ts[:, eb]  # [T,6]
    va, vb = tv[:, ea], tv[:, eb]  # [T,6,3]
    denom = sb - sa
    safe = jnp.where(jnp.abs(denom) > 1e-10, denom, 1e-10)
    w = sb / safe  # weight on v_a
    w = jnp.clip(w, 0.0, 1.0)[..., None]
    epts = w * va + (1.0 - w) * vb  # [T,6,3]

    tbl = jnp.asarray(_MT_TABLE)[config]  # [T,2,3]
    used = tbl >= 0
    idx = jnp.maximum(tbl, 0)
    tris = jnp.take_along_axis(
        epts[:, None, :, :], idx[..., None].repeat(3, -1), axis=2
    )  # [T,2,3,3]
    mask = used[..., 0] & used[..., 1] & used[..., 2]  # [T,2]
    tris = jnp.where(mask[..., None, None], tris, 0.0)
    return tris.reshape(-1, 3, 3), mask.reshape(-1)


@dataclasses.dataclass(frozen=True)
class TetSDFGridConfig:
    radius: float = 1.0
    isosurface_resolution: int = 32
    deformable: bool = True  # isosurface_deformable_grid
    n_feature_dims: int = 3
    hash_cfg: HashGridConfig = HashGridConfig()
    n_neurons: int = 64
    n_hidden_layers: int = 1
    geometry_only: bool = False
    sdf_init: str = "sphere"  # initialize_shape(): analytic sphere SDF
    sdf_init_radius: float = 0.5


class TetrahedraSDFGrid(nn.Module):
    """tetrahedra-sdf-grid: the sdf/deformation ARE the parameters (not
    an MLP), plus an optional feature field for texture
    (tetrahedra_sdf_grid.py configure())."""

    cfg: TetSDFGridConfig = TetSDFGridConfig()

    def setup(self):
        c = self.cfg
        gv, gt = tet_grid(c.isosurface_resolution)
        self.grid_verts = jnp.asarray(gv)  # [V,3] in [0,1]
        self.tets = jnp.asarray(gt)
        world = (gv * 2.0 - 1.0) * c.radius
        if c.sdf_init == "sphere":
            init_vals = (
                np.linalg.norm(world, axis=-1) - c.sdf_init_radius
            ).astype(np.float32)
        else:
            init_vals = np.random.RandomState(0).normal(
                0, 0.1, (gv.shape[0],)
            ).astype(np.float32)
        self.sdf = self.param(
            "sdf", lambda *_: jnp.asarray(init_vals), (gv.shape[0],)
        )
        if c.deformable:
            self.deformation = self.param(
                "deformation",
                nn.initializers.zeros,
                (gv.shape[0], 3),
            )
        if not c.geometry_only:
            self.encoding = HashGridEncoding(c.hash_cfg)
            self.feature_network = VanillaMLP(
                c.n_feature_dims, c.n_neurons, c.n_hidden_layers
            )

    def isosurface(self):
        """-> (tri_verts [F,3,3] world coords, mask [F])."""
        c = self.cfg
        v = self.grid_verts
        if c.deformable:
            # clamp deformation to half a cell so tets never invert
            lim = 0.5 / c.isosurface_resolution
            v = v + jnp.tanh(self.deformation) * lim
        world = (v * 2.0 - 1.0) * c.radius
        return marching_tets(world, self.sdf, self.tets)

    def features(self, points):
        c = self.cfg
        u = jnp.clip((points / c.radius + 1.0) * 0.5, 0.0, 1.0)
        return self.feature_network(self.encoding(u))

    def __call__(self, points, output_normal: bool = False):
        if self.cfg.geometry_only:
            return {}
        return {"features": self.features(points)}


@dataclasses.dataclass(frozen=True)
class CustomMeshConfig:
    n_feature_dims: int = 3
    encoding: str = "hashgrid"
    hash_cfg: HashGridConfig = HashGridConfig()
    n_frequencies: int = 6
    n_neurons: int = 64
    n_hidden_layers: int = 1
    radius: float = 1.0


class CustomMesh(nn.Module):
    """custom-mesh: fixed triangle mesh + learned surface feature field
    (custom_mesh.py; the trimesh load/recenter/reorient preprocessing
    lives in the caller — this module takes verts/faces arrays)."""

    verts: jnp.ndarray  # [V,3]
    faces: jnp.ndarray  # [F,3] int32
    cfg: CustomMeshConfig = CustomMeshConfig()

    def setup(self):
        c = self.cfg
        if c.encoding == "hashgrid":
            self.encoding = HashGridEncoding(c.hash_cfg)
        else:
            self.encoding = FrequencyEncoding(c.n_frequencies)
        self.feature_network = VanillaMLP(
            c.n_feature_dims, c.n_neurons, c.n_hidden_layers
        )

    def isosurface(self):
        tris = self.verts[self.faces]  # [F,3,3]
        return tris, jnp.ones((tris.shape[0],), bool)

    def __call__(self, points, output_normal: bool = False):
        u = jnp.clip((points / self.cfg.radius + 1.0) * 0.5, 0.0, 1.0)
        return {"features": self.feature_network(self.encoding(u))}


# ---------------------------------------------------------------------------
# mesh rasterization (nvdiff-rasterizer analogue)
# ---------------------------------------------------------------------------


def rasterize_mesh(tri_verts, tri_mask, mvp, height: int, width: int,
                   attrs=None, chunk: int = 256):
    """Z-buffered triangle rasterization in pure JAX.

    tri_verts [F,3,3] world, tri_mask [F], mvp [4,4] (row-vector clip
    transform), attrs [F,3,A] per-corner attributes (default: world
    position). Returns dict(attr [H,W,A], depth [H,W], mask [H,W],
    face [H,W] int32). The winner search runs chunked with stop_grad;
    interpolation re-derives barycentrics differentiably for the winning
    face (nvdiffrast rasterize+interpolate semantics, no antialiasing).
    """
    f = tri_verts.shape[0]
    pad = (-f) % chunk
    tv = jnp.pad(tri_verts, ((0, pad), (0, 0), (0, 0)))
    tm = jnp.pad(tri_mask, (0, pad))
    if attrs is None:
        attrs = tri_verts
    attrs = jnp.pad(attrs, ((0, pad), (0, 0), (0, 0)))
    fpad = f + pad

    ones = jnp.ones(tv.shape[:-1] + (1,), tv.dtype)
    clip = jnp.concatenate([tv, ones], -1) @ mvp  # [F,3,4]
    wc = clip[..., 3:4]
    ndc = clip[..., :3] / jnp.where(jnp.abs(wc) > 1e-8, wc, 1e-8)
    sx = (ndc[..., 0] + 1.0) * 0.5 * width  # [F,3]
    sy = (ndc[..., 1] + 1.0) * 0.5 * height
    sz = ndc[..., 2]
    front = jnp.all(wc[..., 0] > 1e-6, axis=-1) & tm

    px = (jnp.arange(width, dtype=jnp.float32) + 0.5)[None, :]
    py = (jnp.arange(height, dtype=jnp.float32) + 0.5)[:, None]
    px = jnp.broadcast_to(px, (height, width)).reshape(-1)  # [P]
    py = jnp.broadcast_to(py, (height, width)).reshape(-1)

    def bary(ax, ay, bx, by, cx, cy, qx, qy):
        d = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
        d = jnp.where(jnp.abs(d) > 1e-12, d, 1e-12)
        l0 = ((by - cy) * (qx - cx) + (cx - bx) * (qy - cy)) / d
        l1 = ((cy - ay) * (qx - cx) + (ax - cx) * (qy - cy)) / d
        return l0, l1, 1.0 - l0 - l1

    n_chunks = fpad // chunk
    sxc = jax.lax.stop_gradient(sx).reshape(n_chunks, chunk, 3)
    syc = jax.lax.stop_gradient(sy).reshape(n_chunks, chunk, 3)
    szc = jax.lax.stop_gradient(sz).reshape(n_chunks, chunk, 3)
    okc = front.reshape(n_chunks, chunk)

    def body(carry, inp):
        zbuf, fbuf = carry
        cx, cy, cz, ok, base = inp
        # degenerate (zero screen area) triangles — e.g. marching-tets
        # slivers where a grid vertex sits exactly on the isosurface —
        # would pass the barycentric test everywhere; cull them
        area2 = (cx[:, 1] - cx[:, 0]) * (cy[:, 2] - cy[:, 0]) - (
            cx[:, 2] - cx[:, 0]
        ) * (cy[:, 1] - cy[:, 0])
        ok = ok & (jnp.abs(area2) > 1e-9)
        l0, l1, l2 = bary(
            cx[None, :, 0], cy[None, :, 0], cx[None, :, 1], cy[None, :, 1],
            cx[None, :, 2], cy[None, :, 2], px[:, None], py[:, None],
        )  # [P, C]
        inside = (l0 >= 0) & (l1 >= 0) & (l2 >= 0) & ok[None, :]
        z = l0 * cz[None, :, 0] + l1 * cz[None, :, 1] + l2 * cz[None, :, 2]
        z = jnp.where(inside, z, jnp.inf)
        zmin = jnp.min(z, axis=1)
        amin = jnp.argmin(z, axis=1).astype(jnp.int32) + base
        better = zmin < zbuf
        return (
            jnp.where(better, zmin, zbuf),
            jnp.where(better, amin, fbuf),
        ), None

    z0 = jnp.full((height * width,), jnp.inf)
    f0 = jnp.full((height * width,), -1, jnp.int32)
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (zb, fb), _ = jax.lax.scan(body, (z0, f0), (sxc, syc, szc, okc, bases))

    hit = fb >= 0
    fid = jnp.maximum(fb, 0)
    # differentiable re-interpolation on the winning face
    wx, wy, wz = sx[fid], sy[fid], sz[fid]  # [P,3]
    l0, l1, l2 = bary(
        wx[:, 0], wy[:, 0], wx[:, 1], wy[:, 1], wx[:, 2], wy[:, 2], px, py
    )
    fa = attrs[fid]  # [P,3,A]
    attr = (
        l0[:, None] * fa[:, 0] + l1[:, None] * fa[:, 1]
        + l2[:, None] * fa[:, 2]
    )
    depth = l0 * wz[:, 0] + l1 * wz[:, 1] + l2 * wz[:, 2]
    hitf = hit.astype(jnp.float32)
    return {
        "attr": (attr * hitf[:, None]).reshape(height, width, -1),
        "depth": (depth * hitf).reshape(height, width),
        "mask": hit.reshape(height, width),
        "face": jnp.where(hit, fb, -1).reshape(height, width),
    }


def face_normals(tri_verts):
    """[F,3,3] -> unit normals [F,3]."""
    e1 = tri_verts[:, 1] - tri_verts[:, 0]
    e2 = tri_verts[:, 2] - tri_verts[:, 0]
    n = jnp.cross(e1, e2)
    return n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-9)


class NVDiffRasterizer:
    """nvdiff-rasterizer analogue: geometry.isosurface() -> mesh,
    rasterize with interpolated positions, shade with the material,
    composite over the background (renderers/nvdiff_rasterizer.py
    forward: normal/position/color AOVs)."""

    def __init__(self, geometry, material, background, height=256,
                 width=256):
        self.geometry = geometry
        self.material = material
        self.background = background
        self.height = height
        self.width = width

    def init_params(self, rng):
        kg, km, kb = jax.random.split(rng, 3)
        gp = self.geometry.init(kg, jnp.zeros((4, 3)))
        nfd = self.geometry.cfg.n_feature_dims
        mp = self.material.init(km, jnp.zeros((4, nfd)))
        bp = self.background.init(kb, jnp.zeros((4, 3)))
        return {"geometry": gp, "material": mp, "background": bp}

    def render(self, params, mvp, camera_position=None,
               light_positions=None, rng=None):
        tris, mask = self.geometry.apply(
            params["geometry"], method="isosurface"
        )
        out = rasterize_mesh(
            tris, mask, mvp, self.height, self.width, attrs=tris
        )
        pos = out["attr"]  # [H,W,3] world positions
        hit = out["mask"]
        geo = self.geometry.apply(params["geometry"], pos.reshape(-1, 3))
        nrm = face_normals(tris)[jnp.maximum(out["face"], 0).reshape(-1)]
        mat_kwargs = {}
        if light_positions is not None:
            mat_kwargs = dict(
                positions=pos.reshape(-1, 3),
                normal=nrm,
                light_positions=jnp.broadcast_to(
                    light_positions, (pos.reshape(-1, 3).shape[0], 3)
                ),
            )
        rgb = self.material.apply(
            params["material"], geo["features"], **mat_kwargs
        ).reshape(self.height, self.width, 3)
        if camera_position is not None:
            dirs = pos - camera_position[None, None, :]
            dirs = dirs / (
                jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-8
            )
        else:
            dirs = jnp.zeros_like(pos)
        bg = self.background.apply(
            params["background"], dirs.reshape(-1, 3)
        ).reshape(self.height, self.width, 3)
        m = hit.astype(jnp.float32)[..., None]
        return {
            "comp_rgb": rgb * m + bg * (1.0 - m),
            "comp_normal": nrm.reshape(self.height, self.width, 3)
            * m,
            "opacity": m,
            "depth": out["depth"],
            "mesh": (tris, mask),
        }


class PatchRenderer:
    """patch-renderer: full-res random patch + downsampled global view
    (patch_renderer.py forward). The base renderer is any object with
    render_image(params, c2w, fovy, h, w, ...)."""

    def __init__(self, base_renderer, patch_size: int = 32,
                 global_downsample: int = 4, global_detach: bool = False):
        self.base = base_renderer
        self.patch_size = patch_size
        self.global_downsample = global_downsample
        self.global_detach = global_detach

    def init_params(self, rng, **kw):
        return self.base.init_params(rng, **kw)

    def render_image(self, params, c2w, fovy, height, width, rng=None,
                     **kw):
        from humangaussian_tpu.nerf.renderer import get_rays

        ds = self.global_downsample
        glob = self.base.render_image(
            params, c2w, fovy, height // ds, width // ds, rng, **kw
        )
        if self.global_detach:
            glob = jax.tree.map(jax.lax.stop_gradient, glob)
        ps = self.patch_size
        if rng is not None:
            ky, kx, rng = jax.random.split(rng, 3)
            y0 = jax.random.randint(ky, (), 0, height - ps + 1)
            x0 = jax.random.randint(kx, (), 0, width - ps + 1)
        else:
            y0 = x0 = (height - ps) // 2
        origins, dirs = get_rays(c2w, fovy, height, width)
        po = jax.lax.dynamic_slice(origins, (y0, x0, 0), (ps, ps, 3))
        pd = jax.lax.dynamic_slice(dirs, (y0, x0, 0), (ps, ps, 3))
        patch = self.base.render_rays(
            params, po.reshape(-1, 3), pd.reshape(-1, 3), rng, **kw
        )
        patch = jax.tree.map(
            lambda x: x.reshape((ps, ps) + x.shape[1:]), patch
        )
        return {"global": glob, "patch": patch, "patch_origin": (y0, x0)}
