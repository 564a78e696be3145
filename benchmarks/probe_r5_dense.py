"""Converged-scene dense-phase bound (round-4 verdict Next #8).

The 3600-step rehearsals run from RANDOM guidance weights, which
scatters Gaussians and inflates pair pressure; the dense-phase step
time and overflow trajectory inherit that bias. This probe bounds the
dense phase on a CONCENTRATED scene shaped like a converged avatar:

  - N alive Gaussians sampled on the toy SMPL-X body surface (the
    reference's converged avatars are body shells, ~526k);
  - per-Gaussian scale ~ local 3-NN spacing (what densification
    converges to: splats tile the surface);
  - opacities in the annealed [0.02, 0.55] band (train/system.py
    annealing after step 1500), beta-skewed toward the top.

Reports, for the rehearsal's exact raster config (tile=32, rect 2x2,
pair_factor=4, batch 8 x 1024^2): shape-class histogram, live pairs,
overflow, and the chained render fwd+bwd step time — next to the same
measurements on an equal-size SCATTERED scene (the rehearsal's regime).

Env: N (default 460800), BATCH (8), ITERS (4).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.core.camera import camera_from_c2w
from humangaussian_tpu.data.cameras import (
    RandomCameraConfig,
    sample_camera_batch,
)
from humangaussian_tpu.ops.binning import build_pair_lists
from humangaussian_tpu.ops.projection import RasterizeConfig, project_gaussians
from humangaussian_tpu.ops.rasterize_tiled import rasterize_tiled_batch
from humangaussian_tpu.smplx.model import toy_model
from humangaussian_tpu.smplx.skeleton import Skeleton
from humangaussian_tpu.train.loop import active_rank_bucket

N = int(os.environ.get("N", "460800"))
BATCH = int(os.environ.get("BATCH", "8"))
ITERS = int(os.environ.get("ITERS", "4"))
# overflow-ladder rungs (train/loop.py): FRACS=default|wide|none picks
# the class_fracs rung, TILE_CAP the per-tile K clamp — measures the
# step-time cost of rendering the pairs the old caps silently dropped
TILE_CAP = int(os.environ.get("TILE_CAP", "16384"))
_FRACS = {
    "default": (0.5625, 0.25),
    "wide": (0.75, 0.125),
    "none": None,
}[os.environ.get("FRACS", "default")]
CAPACITY = 1 << 19
H = W = 1024

cfg = RasterizeConfig(tile=32, max_tiles_per_gaussian=4, pair_factor=4,
                      class_fracs=_FRACS)
cam_cfg = RandomCameraConfig(batch_size=BATCH, height=H, width=W)


def shell_scene(key):
    """Concentrated body-shell scene."""
    skel = Skeleton(style="humansd", apose=True).load_smplx(
        toy_model()).scale(-10)
    pts = skel.sample_smplx_points(N, seed=0)  # [N,3] on the surface
    pts = np.asarray(pts, np.float32)
    # local spacing from a subsample (exact 3-NN at 460k is slow):
    # nearest-neighbor distance of surface-uniform samples scales as
    # sqrt(area/N); estimate from 4096 points
    sub = pts[np.random.RandomState(0).choice(N, 4096, replace=False)]
    d2 = ((sub[:, None, :] - sub[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nn = np.sqrt(d2.min(1))
    base = float(np.median(nn)) * np.sqrt(4096.0 / N)
    r = np.random.RandomState(1)
    scales = (base * np.exp(r.randn(N, 3).astype(np.float32) * 0.3)
              ).astype(np.float32)
    opas = (0.02 + 0.53 * r.beta(5.0, 2.0, N)).astype(np.float32)
    return pts, scales, opas


def scattered_scene():
    r = np.random.RandomState(0)
    pts = (r.randn(N, 3) * 0.5).astype(np.float32)
    scales = np.exp(r.randn(N, 3).astype(np.float32) * 0.5 - 5.0)
    opas = (0.02 + 0.53 * r.beta(5.0, 2.0, N)).astype(np.float32)
    return pts, scales, opas


def pad(x, fill=0.0):
    return jnp.asarray(np.concatenate(
        [x, np.full((CAPACITY - N,) + x.shape[1:], fill, x.dtype)]))


def measure(tag, pts, scales, opas):
    r = np.random.RandomState(2)
    means = pad(pts)
    scl = pad(scales, 1e-6)
    quats = pad(np.concatenate(
        [np.ones((N, 1), np.float32), np.zeros((N, 3), np.float32)], 1))
    sh = pad((r.randn(N, 1, 3) * 0.2).astype(np.float32))
    op = pad(opas)
    alive = jnp.arange(CAPACITY) < N
    bucket = active_rank_bucket(N, CAPACITY) or CAPACITY
    cams = sample_camera_batch(jax.random.PRNGKey(3), 3000, cam_cfg)
    cam_objs = jax.vmap(
        lambda c2w, fovy: camera_from_c2w(c2w, fovy, H, W)
    )(cams.c2w, cams.fovy)
    bg = jnp.zeros((3,))

    # class stats on camera 0
    cam0 = jax.tree.map(lambda x: x[0], cam_objs)
    p0 = project_gaussians(means, scl, quats, sh, op, alive, cam0, 0, cfg)
    pairs0 = build_pair_lists(
        p0, W // cfg.tile, H // cfg.tile, TILE_CAP, cfg,
        pair_capacity=min(4 * bucket, pairs_budget()), active_cap=bucket)
    rw = np.asarray(p0.rect[:, 2] - p0.rect[:, 0])
    rh = np.asarray(p0.rect[:, 3] - p0.rect[:, 1])
    vis = np.asarray(p0.visible)
    shapes = {}
    for a, b_ in zip(rw[vis], rh[vis]):
        shapes[(int(a), int(b_))] = shapes.get((int(a), int(b_)), 0) + 1
    live = int(np.sum(np.asarray(pairs0.counts)))
    print(f"[{tag}] visible={int(vis.sum())} live_pairs={live} "
          f"overflow={int(pairs0.overflow)} blocks={pairs0.blocks}",
          flush=True)
    print(f"[{tag}] shape histogram: {dict(sorted(shapes.items()))}",
          flush=True)

    def loss(m):
        out = rasterize_tiled_batch(
            m, scl, quats, sh, op, alive, cam_objs, bg, 0, cfg,
            tile_capacity=TILE_CAP, active_cap=bucket)
        return (jnp.sum(out["image"]) + jnp.sum(out["alpha"])
                + jnp.sum(out["depth"]) * 1e-3)

    @jax.jit
    def chain(m):
        def body(i, a):
            return a + jax.grad(loss)(a) * 1e-12

        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, m)[0])

    float(chain(means))
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        float(chain(means))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"[{tag}] render fwd+bwd (batch {BATCH} x {H}x{W}, "
          f"bucket {bucket}): {best:.3f} s/step", flush=True)
    return best


def pairs_budget():
    return 16_800_000 // BATCH


if __name__ == "__main__":
    k = jax.random.PRNGKey(0)
    t_shell = measure("shell", *shell_scene(k))
    t_scatter = measure("scatter", *scattered_scene())
    print(f"dense render step: shell {t_shell:.3f} s vs scattered "
          f"{t_scatter:.3f} s", flush=True)
