"""Pure-JAX *oracle* rasterizer: exact compositing semantics, any backend.

This is the correctness reference for the production tile-binned
rasterizer (humangaussian_tpu.ops.rasterize): O(N * pixels) brute force,
but expressed as a vectorized scan so it runs everywhere (CPU tests,
interpret mode) and is differentiable end-to-end via autodiff.

It reproduces the CUDA renderCUDA loop (diff-gaussian-rasterization
forward.cu, ashawkey fork with depth+alpha, called from
/root/reference/gaussiansplatting/gaussian_renderer/__init__.py:86-104)
*exactly*, including its branchy per-pixel early-outs, via a
log-transmittance reformulation:

  For pixel p and depth-ordered Gaussians i with alpha_i(p):
    pass_i  = (power_i <= 0) & (alpha_i >= 1/255) & (p in tile-rect_i)
    T_i     = prod_{j<i, contrib_j} (1 - alpha_j)        (front-to-back)
    trigger = pass_i & (T_i * (1 - alpha_i) < 1e-4)      (CUDA "done")
    contrib = pass_i & no trigger at any j <= i          (latched stop)
    C      += T_i * alpha_i * c_i   [rgb, depth];  T final -> alpha, bg

  Because `done` latches and T is the product over *contributing* j < i,
  the whole recurrence vectorizes per chunk as an exclusive cumsum of
  log(1-alpha) plus an inclusive cummax of the trigger flag — no
  per-Gaussian sequential loop. The production Pallas kernel uses the
  identical identity, so oracle and kernel agree to float rounding.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from humangaussian_tpu.core.camera import Camera
from humangaussian_tpu.ops.projection import (
    ProjectedGaussians,
    RasterizeConfig,
    project_gaussians,
)


def depth_order(prims: ProjectedGaussians) -> jnp.ndarray:
    """Indices of Gaussians sorted by view depth (invisible last).

    Ties broken by index for determinism (the CUDA radix sort is stable
    over duplication order, which is index order).
    """
    n = prims.depths.shape[0]
    key = jnp.where(prims.visible, prims.depths, jnp.inf)
    _, order = jax.lax.sort(
        (key, jnp.arange(n, dtype=jnp.int32)), num_keys=1, is_stable=True
    )
    return order


@functools.partial(jax.jit, static_argnames=("height", "width", "cfg", "chunk"))
def _rasterize_prims(
    means2d,
    depths,
    conics,
    rgb,
    opacities,
    rect,
    visible,
    order,
    background,
    height: int,
    width: int,
    cfg: RasterizeConfig,
    chunk: int = 256,
):
    n = means2d.shape[0]
    p = height * width

    # depth-ordered gather
    mxy = means2d[order]
    con = conics[order]
    col = rgb[order]
    opa = opacities[order]
    dep = depths[order]
    rct = rect[order]
    vis = visible[order]

    ys, xs = jnp.mgrid[0:height, 0:width]
    pix_x = xs.reshape(p).astype(jnp.float32)
    pix_y = ys.reshape(p).astype(jnp.float32)
    pix_tx = (xs // cfg.tile).reshape(p)
    pix_ty = (ys // cfg.tile).reshape(p)

    log_eps = jnp.float32(jnp.log(cfg.transmittance_eps))
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n

    def pad0(x):
        return jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
        )

    mxy, con, col, opa, dep = map(pad0, (mxy, con, col, opa, dep))
    rct = pad0(rct)
    vis = jnp.concatenate([vis, jnp.zeros((pad,), bool)])

    def chunk_body(carry, xs_c):
        log_t, done, acc = carry  # [P], [P] bool, [P,5] (rgb, depth, alpha-w)
        c_mxy, c_con, c_col, c_opa, c_dep, c_rct, c_vis = xs_c
        g = chunk

        dx = c_mxy[:, 0][None, :] - pix_x[:, None]  # [P, G]
        dy = c_mxy[:, 1][None, :] - pix_y[:, None]
        power = (
            -0.5 * (c_con[:, 0][None] * dx * dx + c_con[:, 2][None] * dy * dy)
            - c_con[:, 1][None] * dx * dy
        )
        alpha_raw = c_opa[None, :] * jnp.exp(jnp.minimum(power, 0.0))
        alpha = jnp.minimum(alpha_raw, cfg.alpha_max)

        in_rect = (
            (pix_tx[:, None] >= c_rct[None, :, 0])
            & (pix_tx[:, None] < c_rct[None, :, 2])
            & (pix_ty[:, None] >= c_rct[None, :, 1])
            & (pix_ty[:, None] < c_rct[None, :, 3])
        )
        pass_ = (
            c_vis[None, :]
            & in_rect
            & (power <= 0.0)
            & (alpha >= cfg.alpha_min)
        )

        log1ma = jnp.where(pass_, jnp.log1p(-jnp.where(pass_, alpha, 0.0)), 0.0)
        cum = jnp.cumsum(log1ma, axis=1)
        log_t_before = log_t[:, None] + cum - log1ma  # exclusive cumsum + carry
        trigger = pass_ & (log_t_before + log1ma < log_eps)
        done_upto = done[:, None] | (jnp.cumsum(trigger, axis=1) > 0)
        contrib = pass_ & ~done_upto

        w = jnp.where(contrib, jnp.exp(log_t_before) * alpha, 0.0)  # [P,G]
        feats = jnp.concatenate(
            [c_col, c_dep[:, None], jnp.ones((g, 1), jnp.float32)], axis=1
        )  # [G,5]
        acc = acc + w @ feats
        log_t = log_t + jnp.sum(jnp.where(contrib, log1ma, 0.0), axis=1)
        done = done_upto[:, -1]
        return (log_t, done, acc), None

    init = (
        jnp.zeros((p,), jnp.float32),
        jnp.zeros((p,), bool),
        jnp.zeros((p, 5), jnp.float32),
    )
    xs_chunks = tuple(
        x.reshape((n_chunks, chunk) + x.shape[1:])
        for x in (mxy, con, col, opa, dep, rct, vis)
    )
    (log_t, _done, acc), _ = jax.lax.scan(
        jax.checkpoint(chunk_body), init, xs_chunks
    )

    t_final = jnp.exp(log_t)
    image = acc[:, :3] + t_final[:, None] * background[None, :]
    depth_img = acc[:, 3]
    alpha_img = 1.0 - t_final
    return (
        image.reshape(height, width, 3),
        depth_img.reshape(height, width),
        alpha_img.reshape(height, width),
    )


def rasterize_reference(
    means,
    scales,
    quats,
    features,
    opacities,
    alive,
    camera: Camera,
    background: jnp.ndarray,
    sh_degree: int = 0,
    cfg: RasterizeConfig = RasterizeConfig(),
    scale_modifier: float = 1.0,
    means2d_offset: jnp.ndarray | None = None,
    chunk: int = 256,
):
    """Oracle render. Returns dict matching the reference render() contract
    (gaussian_renderer/__init__.py:98-104): image [H,W,3], radii [N] int32,
    depth [H,W], alpha [H,W]."""
    prims = project_gaussians(
        means,
        scales,
        quats,
        features,
        opacities,
        alive,
        camera,
        sh_degree,
        cfg,
        scale_modifier,
        means2d_offset,
    )
    order = depth_order(prims)
    image, depth_img, alpha_img = _rasterize_prims(
        prims.means2d,
        prims.depths,
        prims.conics,
        prims.rgb,
        prims.opacities,
        prims.rect,
        prims.visible,
        order,
        background,
        camera.height,
        camera.width,
        cfg,
        chunk,
    )
    return {
        "image": image,
        "depth": depth_img,
        "alpha": alpha_img,
        "radii": prims.radii,
        "visible": prims.visible,
    }
