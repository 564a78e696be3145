"""Projection layout experiment: current vs column-math implementations.

Hypothesis: [N,3]/[N,4] arrays are lane-padded to 128 on TPU, so every
columnwise op on them moves ~40x the useful bytes; expressing the whole
projection as math on [N] 1-D columns (single extract at entry, single
stack at exit) should collapse the cost.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.core.camera import camera_from_c2w, look_at_c2w
from humangaussian_tpu.ops.projection import RasterizeConfig, project_gaussians

N = 100_000
H = W = 1024
ITERS = int(os.environ.get("ITERS", "20"))
nprng = np.random.RandomState(0)
means = jnp.asarray(nprng.randn(N, 3).astype(np.float32) * 0.5)
scales = jnp.asarray(np.exp(nprng.randn(N, 3).astype(np.float32) * 0.5 - 5.0))
quats = jnp.asarray(nprng.randn(N, 4).astype(np.float32))
feats = jnp.asarray(nprng.randn(N, 1, 3).astype(np.float32) * 0.3)
opas = jnp.asarray((1 / (1 + np.exp(-nprng.randn(N, 1)))).astype(np.float32))
alive = jnp.ones((N,), bool)
c2w = look_at_c2w(jnp.array([0.0, 0.0, 3.0]), jnp.zeros(3),
                  jnp.array([0.0, 1.0, 0.0]))
cam = camera_from_c2w(c2w, 0.8, H, W)
cfg = RasterizeConfig(tile=32, max_tiles_per_gaussian=9, pair_factor=4)


def chain(name, fn, x0):
    f = jax.jit(lambda x: jax.lax.fori_loop(0, ITERS, lambda i, a: fn(a), x))
    out = f(x0); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = f(x0); jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


def project_cols(means, scales, quats, features, opacities, alive, camera,
                 cfg, scale_modifier=1.0):
    """Column-math projection: one extract at entry, one stack at exit.
    Returns (fmat [N,16], radii, rect, visible, depths)."""
    f32 = jnp.float32
    view = camera.view.astype(f32)
    full_proj = camera.full_proj.astype(f32)
    w, h = camera.width, camera.height
    focal_x, focal_y = camera.focal_x, camera.focal_y
    n = means.shape[0]

    mx, my, mz = means[:, 0], means[:, 1], means[:, 2]
    pv = [mx * view[0, j] + my * view[1, j] + mz * view[2, j] + view[3, j]
          for j in range(3)]
    ph = [mx * full_proj[0, j] + my * full_proj[1, j] + mz * full_proj[2, j]
          + full_proj[3, j] for j in range(4)]
    p_w = 1.0 / (ph[3] + 1e-7)
    depth = pv[2]
    in_front = depth > cfg.near

    qw_, qx_, qy_, qz_ = quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3]
    qn = jax.lax.rsqrt(qw_ * qw_ + qx_ * qx_ + qy_ * qy_ + qz_ * qz_ + 1e-24)
    qw, qx, qy, qz = qw_ * qn, qx_ * qn, qy_ * qn, qz_ * qn
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
    txtz = jnp.clip(pv[0] / z_safe, -limx, limx) * z_safe
    tytz = jnp.clip(pv[1] / z_safe, -limy, limy) * z_safe
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z
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
    mid = 0.5 * (cov_a + cov_c)
    lam_max = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det_safe))
    radius_f = jnp.minimum(jnp.ceil(3.0 * jnp.sqrt(lam_max)),
                           cfg.max_radius_px)

    m2x = ((ph[0] * p_w + 1.0) * w - 1.0) * 0.5
    m2y = ((ph[1] * p_w + 1.0) * h - 1.0) * 0.5

    ext_x = jnp.minimum(jnp.ceil(3.0 * jnp.sqrt(cov_a)), cfg.max_radius_px)
    ext_y = jnp.minimum(jnp.ceil(3.0 * jnp.sqrt(cov_c)), cfg.max_radius_px)
    tiles_x = -(-w // cfg.tile)
    tiles_y = -(-h // cfg.tile)
    ex = jax.lax.stop_gradient(ext_x)
    ey = jax.lax.stop_gradient(ext_y)
    sx = jax.lax.stop_gradient(m2x)
    sy = jax.lax.stop_gradient(m2y)
    x0 = jnp.clip(((sx - ex) / cfg.tile).astype(jnp.int32), 0, tiles_x)
    y0 = jnp.clip(((sy - ey) / cfg.tile).astype(jnp.int32), 0, tiles_y)
    x1 = jnp.clip(((sx + ex + cfg.tile - 1) / cfg.tile).astype(jnp.int32),
                  0, tiles_x)
    y1 = jnp.clip(((sy + ey + cfg.tile - 1) / cfg.tile).astype(jnp.int32),
                  0, tiles_y)
    rect_nonempty = (x1 > x0) & (y1 > y0)
    visible = alive & in_front & det_ok & (radius_f > 0) & rect_nonempty
    radii = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)
    vis_i = visible.astype(jnp.int32)

    # SH degree 0
    c0 = 0.28209479177387814
    f0 = features[:, 0, :]
    rgb_r = jnp.maximum(c0 * f0[:, 0] + 0.5, 0.0)
    rgb_g = jnp.maximum(c0 * f0[:, 1] + 0.5, 0.0)
    rgb_b = jnp.maximum(c0 * f0[:, 2] + 0.5, 0.0)

    zero = jnp.zeros((n,), f32)
    fmat = jnp.stack(
        [m2x, m2y, cov_c * inv_det, -cov_b * inv_det, cov_a * inv_det,
         rgb_r, rgb_g, rgb_b, opacities.reshape(-1), depth,
         zero, zero, zero, zero, zero, zero], axis=1)
    rect = jnp.stack([x0 * vis_i, y0 * vis_i, x1 * vis_i, y1 * vis_i],
                     axis=1)
    return fmat, radii, rect, visible, depth


def v0(m):
    p = project_gaussians(m, scales, quats, feats, opas, alive, cam, 0, cfg,
                          1.0, None)
    return m + (jnp.sum(p.means2d) + jnp.sum(p.conics) + jnp.sum(p.rgb)
                + jnp.sum(p.depths)) * 1e-12


def v1(m):
    fmat, radii, rect, vis, depth = project_cols(
        m, scales, quats, feats, opas, alive, cam, cfg)
    return m + (jnp.sum(fmat) + jnp.sum(radii) + jnp.sum(rect)) * 1e-12


chain("projection current", v0, means)
chain("projection column-math", v1, means)

# numeric parity check
p = project_gaussians(means, scales, quats, feats, opas, alive, cam, 0, cfg,
                      1.0, None)
fmat, radii, rect, vis, depth = project_cols(
    means, scales, quats, feats, opas, alive, cam, cfg)
print("means2d close:", bool(jnp.allclose(p.means2d, fmat[:, 0:2], atol=1e-4)))
print("conics close:", bool(jnp.allclose(p.conics, fmat[:, 2:5], atol=1e-4)))
print("rgb close:", bool(jnp.allclose(p.rgb, fmat[:, 5:8], atol=1e-5)))
print("radii equal:", bool(jnp.all(p.radii == radii)))
print("rect equal:", bool(jnp.all(p.rect == rect)))
print("vis equal:", bool(jnp.all(p.visible == vis)))
