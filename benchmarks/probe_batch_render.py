"""Batch-render cost anatomy: B=8 rasterize_tiled_batch vs 8x single.

Finds where the 877ms render-batch step goes (bench_sds_parts) when a
single camera fwd+bwd is only ~39ms (bench.py).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.core.camera import camera_from_c2w, look_at_c2w
from humangaussian_tpu.ops.projection import RasterizeConfig
from humangaussian_tpu.ops.rasterize_tiled import (
    rasterize_tiled, rasterize_tiled_batch)

N = 100_000
CAP = 1 << 17
H = W = 1024
B = 8
ITERS = int(os.environ.get("ITERS", "5"))
rng = np.random.RandomState(0)
means = jnp.asarray(rng.randn(CAP, 3).astype(np.float32) * 0.5)
scales = jnp.asarray(
    np.exp(rng.randn(CAP, 3).astype(np.float32) * 0.5 - 5.0))
quats = jnp.asarray(rng.randn(CAP, 4).astype(np.float32))
sh = jnp.asarray(rng.randn(CAP, 1, 3).astype(np.float32) * 0.3)
opas = jnp.asarray(
    (1 / (1 + np.exp(-rng.randn(CAP)))).astype(np.float32))
alive = jnp.arange(CAP) < N
bg = jnp.zeros((3,), jnp.float32)
cfg = RasterizeConfig(tile=32, max_tiles_per_gaussian=9, pair_factor=4)

angles = np.linspace(0, 2 * np.pi, B, endpoint=False)
c2ws = jnp.stack([
    look_at_c2w(jnp.array([3.0 * np.cos(a), 3.0 * np.sin(a), 0.0]),
                jnp.zeros(3), jnp.array([0.0, 0.0, 1.0]))
    for a in angles])
fovys = jnp.full((B,), 0.8)


class CamBatch:
    pass


def make_cams():
    return jax.vmap(lambda c, f: camera_from_c2w(c, f, H, W))(c2ws, fovys)


cams_b = make_cams()
cam_1 = camera_from_c2w(c2ws[0], 0.8, H, W)
params = dict(means=means, scales=scales, quats=quats, sh=sh, opas=opas)


def chain(name, fn, x0):
    f = jax.jit(lambda x: jax.lax.fori_loop(
        0, ITERS, lambda i, a: fn(a), x))
    out = f(x0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(jax.tree.map(lambda a: a + 1e-6, x0))
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/ITERS*1e3:.1f} ms",
          flush=True)


def batch_render(p, remat):
    def run(q):
        out = rasterize_tiled_batch(
            q["means"], q["scales"], q["quats"], q["sh"], q["opas"],
            alive, cams_b, bg, 0, cfg, tile_capacity=4096)
        return out
    if remat:
        run = jax.checkpoint(run)
    return run(p)


def loss_batch(p, remat):
    o = batch_render(p, remat)
    return jnp.sum(o["image"]) + jnp.sum(o["depth"]) * 1e-3


def single_render(p, cam):
    o = rasterize_tiled(
        p["means"], p["scales"], p["quats"], p["sh"], p["opas"], alive,
        cam, bg, 0, cfg, tile_capacity=4096)
    return jnp.sum(o["image"]) + jnp.sum(o["depth"]) * 1e-3


# batch fwd only
chain("batch8 fwd", lambda p: jax.tree.map(
    lambda a, b: a + b * 1e-12, p,
    jax.tree.map(lambda a: a * 0 + jnp.sum(
        batch_render(p, False)["image"]) * 1e-12, p)), params)

# batch fwd+bwd, no remat
chain("batch8 fwd+bwd noremat",
      lambda p: jax.tree.map(lambda a, b: a + b * 1e-12, p,
                             jax.grad(lambda q: loss_batch(q, False))(p)),
      params)

# batch fwd+bwd, remat
chain("batch8 fwd+bwd remat",
      lambda p: jax.tree.map(lambda a, b: a + b * 1e-12, p,
                             jax.grad(lambda q: loss_batch(q, True))(p)),
      params)

# 8x sequential single-camera fwd+bwd
def seq8(p):
    g = jax.grad(lambda q: sum(
        single_render(q, jax.tree.map(lambda a: a[i], cams_b))
        for i in range(B)))(p)
    return jax.tree.map(lambda a, b: a + b * 1e-12, p, g)


chain("8x single fwd+bwd", seq8, params)
