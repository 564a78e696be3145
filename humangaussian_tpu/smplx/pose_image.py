"""Skeleton pose-image rasterization in pure JAX (cv2-free).

The pose image conditions the dual-branch diffusion prior, so its
geometry must match the reference renderer
(/root/reference/threestudio/utils/poser.py:8-49 humansd style,
:361-414 openpose style) closely:

humansd (`draw_humansd_skeleton`): 16 bones drawn in order, each as a
cv2 line of thickness w = int(10*H/512) plus filled endpoint circles of
radius w//2 — i.e. a capsule of radius w/2 — colored by a seaborn
"hls" 16-palette; later bones overwrite earlier ones. We rasterize each
capsule analytically (distance-to-segment test at pixel centers), which
differs from cv2 only in edge aliasing. Keypoints project through the
MVP with the reference quirk xs=(x+1)/2*H, ys=(y+1)/2*W
(poser.py:420-422; square images in practice).

openpose (`draw`): 18 keypoint circles (r=4) then 17 bone ellipses
(semi-axes (len/2, 4)) alpha-blended at 0.6 over the canvas
(poser.py:395-412), with the controlnet_aux color table.

Occlusion rules (enabled for back views, |azimuth|>120deg at
GaussianDreamer.py:269-282) reproduce poser.py:424-443: the nose/eyes/
ears are hidden depending on the nose depth relative to the two ears.

Everything is jit-stable (static image size and bone count) and runs as
a handful of fused VPU passes per bone.
"""
from __future__ import annotations

import colorsys
import functools

import jax
import jax.numpy as jnp
import numpy as np

# (color_index, joint_a, joint_b) — poser.py:9-26
HUMANSD_SKELETON = (
    (1, 0, 1), (0, 0, 2), (3, 1, 3), (2, 2, 4), (5, 3, 5), (4, 4, 6),
    (7, 5, 7), (6, 6, 8), (9, 7, 9), (8, 8, 10), (11, 5, 11), (10, 6, 12),
    (13, 11, 13), (12, 12, 14), (15, 13, 15), (14, 14, 16),
)

# controlnet_aux openpose colors — poser.py:193-196
OPENPOSE_COLORS = np.array(
    [
        [255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0],
        [170, 255, 0], [85, 255, 0], [0, 255, 0], [0, 255, 85],
        [0, 255, 170], [0, 255, 255], [0, 170, 255], [0, 85, 255],
        [0, 0, 255], [85, 0, 255], [170, 0, 255], [255, 0, 255],
        [255, 0, 170], [255, 0, 85],
    ],
    np.float32,
) / 255.0


def humansd_colors(n: int = 16) -> np.ndarray:
    """seaborn color_palette("hls", n) without seaborn (hls_palette with
    h=.01, l=.6, s=.65), quantized to the uint8 values cv2 draws with."""
    hues = np.linspace(0, 1, n + 1)[:-1]
    hues = (hues + 0.01) % 1.0
    rgb = np.array(
        [colorsys.hls_to_rgb(h, 0.6, 0.65) for h in hues], np.float32
    )
    return np.floor(255.0 * rgb) / 255.0


_HUMANSD_COLORS = humansd_colors(len(HUMANSD_SKELETON))


def project_keypoints(points3d: jnp.ndarray, mvp: jnp.ndarray, height: int, width: int):
    """[K,3] world keypoints -> pixel xs, ys and NDC depth (poser.py:417-422)."""
    k = points3d.shape[0]
    hom = jnp.concatenate([points3d, jnp.ones((k, 1), points3d.dtype)], axis=1)
    p = hom @ mvp.T
    ndc = p[:, :3] / p[:, 3:4]
    xs = (ndc[:, 0] + 1.0) / 2.0 * height  # reference quirk: H scales x
    ys = (ndc[:, 1] + 1.0) / 2.0 * width
    return xs, ys, ndc[:, 2]


def humansd_occlusion_conf(xs, zs, enable) -> jnp.ndarray:
    """Per-keypoint confidences after the empirical head-occlusion rules
    (poser.py:424-443). Index layout: 0 nose, 1 leye, 2 reye, 3 lear, 4 rear."""
    conf = jnp.ones((xs.shape[0],), jnp.float32)
    left_view = (zs[0] > zs[3]) & (zs[0] < zs[4])
    right_view = (zs[0] < zs[3]) & (zs[0] > zs[4])
    back_view = (zs[0] > zs[3]) & (zs[0] > zs[4])
    conf = conf.at[4].set(jnp.where(left_view, 0.0, conf[4]))
    conf = conf.at[2].set(
        jnp.where(left_view & (xs[2] > xs[1]), 0.0, conf[2])
    )
    conf = conf.at[3].set(jnp.where(right_view, 0.0, conf[3]))
    conf = conf.at[1].set(
        jnp.where(right_view & (xs[1] < xs[2]), 0.0, conf[1])
    )
    for i in (0, 1, 2):
        conf = conf.at[i].set(jnp.where(back_view, 0.0, conf[i]))
    return jnp.where(enable, conf, jnp.ones_like(conf))


def _segment_dist2(px, py, ax, ay, bx, by):
    """Squared distance from pixel grid [H,W] to segment a-b."""
    abx, aby = bx - ax, by - ay
    apx, apy = px - ax, py - ay
    denom = jnp.maximum(abx * abx + aby * aby, 1e-8)
    t = jnp.clip((apx * abx + apy * aby) / denom, 0.0, 1.0)
    dx = apx - t * abx
    dy = apy - t * aby
    return dx * dx + dy * dy


@functools.partial(jax.jit, static_argnames=("height", "width"))
def draw_humansd_pose(
    points3d: jnp.ndarray,  # [17,3]
    mvp: jnp.ndarray,  # [4,4]
    height: int = 512,
    width: int = 512,
    enable_occlusion=False,
):
    """humansd-style pose image. Returns (image [H,W,3] f32 in [0,1],
    keypoints [17,3] = (x, y, conf)), like humansd_draw (poser.py:416-459)."""
    xs, ys, zs = project_keypoints(points3d, mvp, height, width)
    conf = humansd_occlusion_conf(xs, zs, jnp.asarray(enable_occlusion))

    w_line = int(10 * height / 512)
    r = w_line / 2.0
    yy, xx = jnp.mgrid[0:height, 0:width]
    xx = xx.astype(jnp.float32)
    yy = yy.astype(jnp.float32)

    # cv2 truncates coordinates to int before drawing
    ixs = jnp.floor(xs)
    iys = jnp.floor(ys)

    # all 16 capsules in ONE [bones, H, W] pass (a sequential
    # where-chain forces 16 serial full-image sweeps; measured 124 ms
    # for 8x512^2 in the train step). cv2's in-order drawing = the
    # LAST bone covering a pixel wins -> argmax over the reversed axis.
    skel = np.asarray(HUMANSD_SKELETON, np.int32)
    ci, ia, ib = skel[:, 0], skel[:, 1], skel[:, 2]
    ok = (conf[ia] > 0.3) & (conf[ib] > 0.3)  # [bones]
    d2 = _segment_dist2(
        xx[None], yy[None],
        ixs[ia][:, None, None], iys[ia][:, None, None],
        ixs[ib][:, None, None], iys[ib][:, None, None],
    )
    mask = ok[:, None, None] & (d2 <= r * r)  # [bones, H, W]
    nb = skel.shape[0]
    winner = nb - 1 - jnp.argmax(mask[::-1], axis=0)
    covered = jnp.any(mask, axis=0)
    colors = jnp.asarray(_HUMANSD_COLORS)[ci]  # draw-order colors
    canvas = jnp.where(covered[..., None], colors[winner], 0.0)

    kp = jnp.stack([xs, ys, conf], axis=1)
    return canvas, kp


@functools.partial(jax.jit, static_argnames=("height", "width"))
def draw_openpose_pose(
    points3d: jnp.ndarray,  # [18,3]
    mvp: jnp.ndarray,
    height: int = 512,
    width: int = 512,
    enable_occlusion=False,
):
    """openpose-style pose image (circles + blended bone ellipses),
    mirroring Skeleton.draw (poser.py:361-414). Returns (image, kp)."""
    from humangaussian_tpu.smplx.skeleton import OPENPOSE18_LINES

    xs, ys, zs = project_keypoints(points3d, mvp, height, width)
    in_img = (xs >= 0) & (xs < height) & (ys >= 0) & (ys < width)

    # occlusion (poser.py:374-390); layout: 0 nose, -4 reye, -3 leye,
    # -2 rear, -1 lear
    mask_kp = in_img.astype(jnp.float32)
    left_view = (zs[0] > zs[-1]) & (zs[0] < zs[-2])
    right_view = (zs[0] < zs[-1]) & (zs[0] > zs[-2])
    back_view = (zs[0] > zs[-1]) & (zs[0] > zs[-2])
    occ = jnp.ones((18,), jnp.float32)
    occ = occ.at[-2].set(jnp.where(left_view, 0.0, occ[-2]))
    occ = occ.at[-4].set(
        jnp.where(left_view & (xs[-4] > xs[-3]), 0.0, occ[-4])
    )
    occ = occ.at[-1].set(jnp.where(right_view, 0.0, occ[-1]))
    occ = occ.at[-3].set(
        jnp.where(right_view & (xs[-3] < xs[-4]), 0.0, occ[-3])
    )
    for i in (0, -3, -4):
        occ = occ.at[i].set(jnp.where(back_view, 0.0, occ[i]))
    mask_kp = mask_kp * jnp.where(jnp.asarray(enable_occlusion), occ, 1.0)

    yy, xx = jnp.mgrid[0:height, 0:width]
    xx = xx.astype(jnp.float32)
    yy = yy.astype(jnp.float32)
    ixs = jnp.floor(xs)
    iys = jnp.floor(ys)

    colors = jnp.asarray(OPENPOSE_COLORS)

    # keypoint circles, radius 4 (poser.py:395-397): one [18, H, W]
    # pass; in-order overwrite = highest covering index wins
    d2 = (xx[None] - ixs[:, None, None]) ** 2 + (
        yy[None] - iys[:, None, None]) ** 2
    maskc = (mask_kp[:, None, None] > 0) & (d2 <= 16.0)
    winner = 17 - jnp.argmax(maskc[::-1], axis=0)
    covered = jnp.any(maskc, axis=0)
    canvas = jnp.where(covered[..., None], colors[winner], 0.0)

    # bone ellipses, blended 0.6 over the canvas in draw order
    # (poser.py:399-412). Sequential blending
    #   canvas <- mask_i ? 0.4*canvas + 0.6*c_i : canvas
    # has the closed form
    #   canvas_final = canvas0 * prod_i w_i
    #                + sum_i 0.6 k_i c_i * prod_{j>i} w_j,
    # with k_i = mask_i in {0,1} and w_i = 0.4^{k_i} = 1 - 0.6 k_i —
    # one [17, H, W] pass instead of 17 serial image sweeps.
    lines = np.asarray(OPENPOSE18_LINES)
    a, b = lines[:, 0], lines[:, 1]
    ok = (mask_kp[a] > 0) & (mask_kp[b] > 0)  # [17]
    mx = jnp.floor((ixs[a] + ixs[b]) / 2.0)[:, None, None]
    my = jnp.floor((iys[a] + iys[b]) / 2.0)[:, None, None]
    dxl = ixs[a] - ixs[b]
    dyl = iys[a] - iys[b]
    length = jnp.sqrt(dxl * dxl + dyl * dyl)
    ang = jnp.arctan2(dyl, dxl)
    ca = jnp.cos(ang)[:, None, None]
    sa = jnp.sin(ang)[:, None, None]
    rx = (xx[None] - mx) * ca + (yy[None] - my) * sa
    ry = -(xx[None] - mx) * sa + (yy[None] - my) * ca
    semi = jnp.maximum(length / 2.0, 1e-3)[:, None, None]
    inside = (rx / semi) ** 2 + (ry / 4.0) ** 2 <= 1.0
    k = (ok[:, None, None] & inside).astype(jnp.float32)  # [17, H, W]
    w = 1.0 - 0.6 * k  # 0.4^k
    sp = jnp.cumprod(w[::-1], axis=0)[::-1]  # prod_{j>=i} w_j
    suffix = sp / w  # prod_{j>i} w_j  (w in {1, 0.4}, never 0)
    canvas = canvas * sp[0][..., None] + jnp.einsum(
        "khw,kc->hwc", 0.6 * k * suffix, colors[: lines.shape[0]])

    kp = jnp.stack([xs, ys, mask_kp], axis=1)
    return canvas, kp
