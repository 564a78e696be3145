"""Per-Gaussian screen-space preprocessing ("project") for splatting.

Computes, for every (padded) Gaussian, the 2D screen mean, view-space
depth, 2D covariance inverse (conic), screen radius, view-dependent RGB,
and the tile rectangle it may touch. Fully batched/differentiable JAX —
on TPU this is a handful of fused VPU passes plus tiny matmuls.

Semantics are those of the CUDA reference preprocess
(diff-gaussian-rasterization forward.cu, called from
/root/reference/gaussiansplatting/gaussian_renderer/__init__.py:86-94):

- near cull at view z <= 0.2;
- EWA: cov2D = J W Sigma W^T J^T with the t.x/t.z clamp at 1.3*tan(fov/2),
  then +0.3 dilation on the diagonal;
- radius = ceil(3 * sqrt(max eigenvalue)) of the dilated cov2D;
- pixel coords via ndc2Pix(v, S) = ((v+1)*S - 1)/2;
- SH -> RGB with +0.5 offset and clamp at 0 (clamped channels get zero
  gradient, as the CUDA backward does);
- Gaussians whose tile rectangle is empty are invisible (radius 0).

Two deliberate, documented deviations:

1. Screen extents are clamped to `cfg.max_radius_px` so that the tile
   rectangle never exceeds a static `max_tiles_per_gaussian` — the price
   of recompile-free static shapes on TPU. The pure-JAX oracle applies
   the identical clamp, so the whole framework is self-consistent; at
   the reference's training scales (gaussians pruned above 20 px radius,
   gaussian_model.py:399-413) the clamp is inactive.
2. The tile rect uses PER-AXIS 3-sigma extents (3*sqrt(cov_xx),
   3*sqrt(cov_yy)) — the exact axis-aligned bounding box of the CUDA
   kernel's own 3-sigma cutoff ellipse — instead of the CUDA rect's
   isotropic radius 3*sqrt(lambda_max). For anisotropic splats this is
   strictly tighter with the same contribution cutoff scale, and it
   directly reduces (tile, Gaussian) pair count, the TPU cost driver.
   The `radii` OUTPUT keeps CUDA semantics (3-sigma of the max
   eigenvalue) since it drives densification pruning.

Everything here is deliberately expressed as elementwise arithmetic on
[N]-columns (no [N,2,3]x[N,3,3] batched matmuls): XLA fuses it into a
few VPU passes, where tiny batched matmuls lower to slow layout shuffles.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from humangaussian_tpu.core.camera import Camera
from humangaussian_tpu.core.sh import eval_sh


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    """Static rasterization parameters (hashable; part of jit closure)."""

    tile: int = 32  # pixel tile edge (tiles are tile x tile)
    max_tiles_per_gaussian: int = 9  # static cap on rect area (s*s)
    pair_factor: int = 6  # pair-buffer capacity = N * pair_factor
    near: float = 0.2  # CUDA near-cull plane
    alpha_min: float = 1.0 / 255.0  # contribution threshold
    alpha_max: float = 0.99  # alpha clamp
    transmittance_eps: float = 1e-4  # early-stop threshold on T
    tight_cull: bool = True  # exact tile-ellipse candidate cull (binning)
    big_capacity: int | None = None  # static big-class (rect > 2x2)
    #   capacity for the class-chain candidate domain (binning module
    #   docstring); None = auto max(4096, n_cap // 8)
    class_fracs: tuple | None = (0.5625, 0.25)  # fractions of the non-big
    #   position budget reserved for the (2,2) and (2,1) class blocks;
    #   (1,1) takes the rest. The chain only LOSES pairs when a class
    #   overflows its cumulative cap (counted in `overflow`); smaller
    #   fractions shrink every candidate-domain-proportional stage
    #   (binning sort, backward routing, reduction). None = the
    #   rounds-1-4 dual-class layout ((2,2) takes the whole remainder).
    bwd_routing: str = "auto"  # "auto" | "sort" | "gather" (see
    #   rasterize_tiled._render_core_bwd: measured crossover ~1.3M
    #   candidates — gather wins small, sort wins post-densification)
    panel_math: str = "exact"  # "exact": per-pixel VPU conic quadratic;
    #   "mxu": tile-centered pixel-monomial matmul evaluates the power
    #   panel on the MXU (same reassociation class as the round-3
    #   monomial backward; measured error in NUMERICS.md)
    cumsum_bf16: bool = False  # fast mode: the per-chunk transmittance
    #   cumsum matmul takes bf16 inputs (f32 accumulation) — 4x MXU.
    #   log1p(-alpha) inputs round to 8-bit mantissa (~4e-4 abs logT
    #   error bound, measured in NUMERICS.md); the gradient-carrying
    #   prefix cumsum in the backward always stays f32.

    def __post_init__(self):
        # YAML configs deliver lists; the config must stay hashable
        # (it rides jit closures as a static)
        if isinstance(self.class_fracs, list):
            object.__setattr__(self, "class_fracs", tuple(self.class_fracs))

    @property
    def rect_side(self) -> int:
        s = int(self.max_tiles_per_gaussian**0.5)
        if s * s != self.max_tiles_per_gaussian:
            raise ValueError("max_tiles_per_gaussian must be a square number")
        return s

    @property
    def max_radius_px(self) -> float:
        # rect width w = floor((px+r-1)/T) - floor((px-r)/T) + 1
        #             <= floor((2r-1)/T) + 2;  w <= s  iff  r <= (s-1)*T/2.
        return (self.rect_side - 1) * self.tile / 2.0


class ProjectedGaussians(NamedTuple):
    """Per-Gaussian screen primitives ([N]-shaped, padded like the scene)."""

    means2d: jnp.ndarray  # [N,2] pixel coords
    depths: jnp.ndarray  # [N] view-space z
    conics: jnp.ndarray  # [N,3] inverse 2D covariance (a, b, c)
    radii: jnp.ndarray  # [N] int32 screen radius, 0 = culled
    rgb: jnp.ndarray  # [N,3] view-dependent color (clamped >= 0)
    opacities: jnp.ndarray  # [N]
    rect: jnp.ndarray  # [N,4] int32 tile rect (x0, y0, x1, y1), x1/y1 excl.
    visible: jnp.ndarray  # [N] bool


def project_gaussians(
    means: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    features: jnp.ndarray,
    opacities: jnp.ndarray,
    alive: jnp.ndarray,
    camera: Camera,
    sh_degree: int,
    cfg: RasterizeConfig = RasterizeConfig(),
    scale_modifier: float = 1.0,
    means2d_offset: jnp.ndarray | None = None,
) -> ProjectedGaussians:
    """Project padded Gaussians into screen space.

    `means2d_offset` ([N,2], typically zeros) is the screen-space gradient
    tap: adding it to the projected means lets the caller read
    d(loss)/d(means2d) via autodiff — the functional equivalent of the
    reference's `screenspace_points.retain_grad()` trick
    (gaussian_renderer/__init__.py:26-30).
    """
    n = means.shape[0]
    f32 = jnp.float32
    view = camera.view.astype(f32)
    full_proj = camera.full_proj.astype(f32)
    w, h = camera.width, camera.height
    focal_x = camera.focal_x
    focal_y = camera.focal_y

    # --- view/clip transforms (row-vector convention) -----------------
    # unrolled column madds, NOT [N,4]x[4,4] matmuls: a K=4 matmul pads
    # the [N,4] operand's lane dim 4 -> 128 (32x HBM) and runs the MXU
    # at 3% utilization; 12 fused VPU madds on [N] columns are ~free
    # (measured round 5: projection 2.5 -> ~1 ms at 100k)
    mx_, my_, mz_ = means[:, 0].astype(f32), means[:, 1].astype(f32), \
        means[:, 2].astype(f32)

    def xform(mat, j, w_row=3):
        return (mx_ * mat[0, j] + my_ * mat[1, j] + mz_ * mat[2, j]
                + mat[w_row, j])

    pv_x = xform(view, 0)
    pv_y = xform(view, 1)
    depth = xform(view, 2)
    p_w = 1.0 / (xform(full_proj, 3) + 1e-7)
    proj_x = xform(full_proj, 0) * p_w
    proj_y = xform(full_proj, 1) * p_w

    in_front = depth > cfg.near

    # --- 3D covariance -> EWA 2D covariance (fully elementwise) -------
    # quat -> rotation entries as [N] columns (normalized, w-x-y-z like
    # the reference's build_rotation, general_utils.py:78-98)
    q0, q1, q2, q3 = quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3]
    qnrm = jnp.sqrt(q0 * q0 + q1 * q1 + q2 * q2 + q3 * q3) + 1e-12
    qw, qx, qy, qz = q0 / qnrm, q1 / qnrm, q2 / qnrm, q3 / qnrm
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - qw * qz)
    r02 = 2 * (qx * qz + qw * qy)
    r10 = 2 * (qx * qy + qw * qz)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - qw * qx)
    r20 = 2 * (qx * qz - qw * qy)
    r21 = 2 * (qy * qz + qw * qx)
    r22 = 1 - 2 * (qx * qx + qy * qy)
    s0 = scales[:, 0] * scale_modifier
    s1 = scales[:, 1] * scale_modifier
    s2 = scales[:, 2] * scale_modifier
    # M = R diag(s); Sigma = M M^T, six unique entries
    m00, m01, m02 = r00 * s0, r01 * s1, r02 * s2
    m10, m11, m12 = r10 * s0, r11 * s1, r12 * s2
    m20, m21, m22 = r20 * s0, r21 * s1, r22 * s2
    sxx = m00 * m00 + m01 * m01 + m02 * m02
    sxy = m00 * m10 + m01 * m11 + m02 * m12
    sxz = m00 * m20 + m01 * m21 + m02 * m22
    syy = m10 * m10 + m11 * m11 + m12 * m12
    syz = m10 * m20 + m11 * m21 + m12 * m22
    szz = m20 * m20 + m21 * m21 + m22 * m22

    limx = 1.3 * camera.tan_fovx
    limy = 1.3 * camera.tan_fovy
    z_safe = jnp.where(in_front, depth, 1.0)
    txtz = jnp.clip(pv_x / z_safe, -limx, limx) * z_safe
    tytz = jnp.clip(pv_y / z_safe, -limy, limy) * z_safe

    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z
    # JW rows (2x3 per Gaussian) as [N] columns: J = d(pixel)/d(view),
    # W = world->cam rotation (view stored transposed, row-vector conv.)
    w_rot = view[:3, :3].T
    a0 = focal_x * inv_z
    a2x = -focal_x * txtz * inv_z2
    b1 = focal_y * inv_z
    b2y = -focal_y * tytz * inv_z2
    u0 = a0 * w_rot[0, 0] + a2x * w_rot[2, 0]
    u1 = a0 * w_rot[0, 1] + a2x * w_rot[2, 1]
    u2 = a0 * w_rot[0, 2] + a2x * w_rot[2, 2]
    v0 = b1 * w_rot[1, 0] + b2y * w_rot[2, 0]
    v1 = b1 * w_rot[1, 1] + b2y * w_rot[2, 1]
    v2 = b1 * w_rot[1, 2] + b2y * w_rot[2, 2]
    # Sigma @ u and Sigma @ v ([N,3] as columns)
    su0 = sxx * u0 + sxy * u1 + sxz * u2
    su1 = sxy * u0 + syy * u1 + syz * u2
    su2 = sxz * u0 + syz * u1 + szz * u2
    sv0 = sxx * v0 + sxy * v1 + sxz * v2
    sv1 = sxy * v0 + syy * v1 + syz * v2
    sv2 = sxz * v0 + syz * v1 + szz * v2
    cov_a = u0 * su0 + u1 * su1 + u2 * su2 + 0.3
    cov_b = v0 * su0 + v1 * su1 + v2 * su2
    cov_c = v0 * sv0 + v1 * sv1 + v2 * sv2 + 0.3

    det = cov_a * cov_c - cov_b * cov_b
    det_ok = det > 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([cov_c * inv_det, -cov_b * inv_det, cov_a * inv_det], axis=-1)

    mid = 0.5 * (cov_a + cov_c)
    lam_max = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det_safe))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lam_max))
    radius_f = jnp.minimum(radius_f, cfg.max_radius_px)  # static-shape cap

    # --- screen position (ndc2Pix) -------------------------------------
    mean2d = jnp.stack(
        [
            ((proj_x + 1.0) * w - 1.0) * 0.5,
            ((proj_y + 1.0) * h - 1.0) * 0.5,
        ],
        axis=-1,
    )
    if means2d_offset is not None:
        mean2d = mean2d + means2d_offset

    # --- tile rectangle (stop-grad integers) ---------------------------
    # per-axis extents: the exact AABB of the CONTRIBUTION ellipse.
    # The compositing gate is alpha = opa*exp(-Q/2) >= alpha_min
    # (rasterize_tiled._chunk_common), so a pixel can only receive
    # contribution inside Q <= q_max = 2*ln(opa/alpha_min); the CUDA
    # 3-sigma cutoff is Q <= 9. The rect uses min(9, q_max) — for
    # opacities below alpha_min*e^4.5 ~ 0.353 this is strictly tighter
    # than 3-sigma with IDENTICAL output (the excluded pixels are
    # exactly the ones the per-pixel gate rejects; same guarantee as
    # binning's tile-ellipse cull, with the same 1e-3 gate margin so f32
    # rounding can never exclude a boundary-passing pixel). Opacity
    # annealing ([0.02, 0.55] in training) makes this the main
    # candidate-domain lever. The `radii` OUTPUT keeps CUDA 3-sigma
    # semantics (it drives densification pruning); per-axis extents vs
    # the CUDA isotropic radius are module-docstring deviation 2.
    opa_col = opacities.reshape(-1)
    q_max = 2.0 * jnp.log(
        jnp.maximum(opa_col, 1e-12) / (cfg.alpha_min * (1.0 - 1e-3))
    )
    s_eff = jnp.sqrt(jnp.clip(q_max, 0.0, 9.0))
    ext_x = jnp.minimum(jnp.ceil(s_eff * jnp.sqrt(cov_a)), cfg.max_radius_px)
    ext_y = jnp.minimum(jnp.ceil(s_eff * jnp.sqrt(cov_c)), cfg.max_radius_px)
    tiles_x = -(-w // cfg.tile)
    tiles_y = -(-h // cfg.tile)
    ex = jax.lax.stop_gradient(ext_x)
    ey = jax.lax.stop_gradient(ext_y)
    mx = jax.lax.stop_gradient(mean2d)
    x0 = jnp.clip(((mx[:, 0] - ex) / cfg.tile).astype(jnp.int32), 0, tiles_x)
    y0 = jnp.clip(((mx[:, 1] - ey) / cfg.tile).astype(jnp.int32), 0, tiles_y)
    x1 = jnp.clip(
        ((mx[:, 0] + ex + cfg.tile - 1) / cfg.tile).astype(jnp.int32), 0, tiles_x
    )
    y1 = jnp.clip(
        ((mx[:, 1] + ey + cfg.tile - 1) / cfg.tile).astype(jnp.int32), 0, tiles_y
    )
    rect_nonempty = (x1 > x0) & (y1 > y0)

    visible = alive & in_front & det_ok & (radius_f > 0) & rect_nonempty
    radii = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)
    rect = jnp.stack([x0, y0, x1, y1], axis=-1) * visible[:, None].astype(jnp.int32)

    # --- SH -> RGB ------------------------------------------------------
    dx = mx_ - camera.campos[0]
    dy_ = my_ - camera.campos[1]
    dz = mz_ - camera.campos[2]
    dnrm = jnp.sqrt(dx * dx + dy_ * dy_ + dz * dz) + 1e-12
    dirs = jnp.stack([dx / dnrm, dy_ / dnrm, dz / dnrm], axis=-1)
    rgb_raw = eval_sh(sh_degree, features, dirs) + 0.5
    rgb = jnp.maximum(rgb_raw, 0.0)  # clamp -> zero grad below 0, like CUDA

    return ProjectedGaussians(
        means2d=mean2d,
        depths=depth,
        conics=conic,
        radii=radii,
        rgb=rgb,
        opacities=opacities.reshape(-1),
        rect=rect,
        visible=visible,
    )
