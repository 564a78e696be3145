"""Minimal compile/run check of the v3 rasterizer kernels on TPU."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.core.camera import camera_from_c2w, look_at_c2w
from humangaussian_tpu.ops.projection import RasterizeConfig
from humangaussian_tpu.ops.rasterize_tiled import rasterize_tiled

rng = np.random.RandomState(0)
n = 2048
cfg = RasterizeConfig(tile=32, max_tiles_per_gaussian=16)
c2w = look_at_c2w(jnp.array([0.0, 0.0, 3.0]), jnp.zeros(3),
                  jnp.array([0.0, 1.0, 0.0]))
camera = camera_from_c2w(c2w, 0.8, 64, 64)
bg = jnp.zeros((3,), jnp.float32)
params = dict(
    means=jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.5),
    scales=jnp.asarray(np.exp(rng.randn(n, 3).astype(np.float32) * 0.5 - 4.0)),
    quats=jnp.asarray(rng.randn(n, 4).astype(np.float32)),
    sh=jnp.asarray(rng.randn(n, 1, 3).astype(np.float32) * 0.3),
    opacities=jnp.asarray((1 / (1 + np.exp(-rng.randn(n)))).astype(np.float32)),
)
alive = jnp.ones((n,), bool)


@jax.jit
def fwd(p):
    return rasterize_tiled(p["means"], p["scales"], p["quats"], p["sh"],
                           p["opacities"], alive, camera, bg, 0, cfg,
                           tile_capacity=1024)["image"]


@jax.jit
def fwdbwd(p):
    def loss(q):
        o = rasterize_tiled(q["means"], q["scales"], q["quats"], q["sh"],
                            q["opacities"], alive, camera, bg, 0, cfg,
                            tile_capacity=1024)
        return jnp.sum(o["image"]) + jnp.sum(o["alpha"])
    return jax.grad(loss)(p)["means"]


print("compiling fwd...", flush=True)
t0 = time.time()
out = fwd(params)
jax.block_until_ready(out)
print(f"fwd compile+run {time.time()-t0:.1f}s sum={np.asarray(out).sum():.3f}",
      flush=True)

print("compiling fwd+bwd...", flush=True)
t0 = time.time()
g = fwdbwd(params)
jax.block_until_ready(g)
print(f"bwd compile+run {time.time()-t0:.1f}s gsum={np.asarray(g).sum():.4f}",
      flush=True)

# numeric check vs CPU interpret path
import jax.numpy as jnp
from humangaussian_tpu.ops.rasterize_tiled import rasterize_tiled as rt2
ref = rasterize_tiled(params["means"], params["scales"], params["quats"],
                      params["sh"], params["opacities"], alive, camera, bg,
                      0, cfg, tile_capacity=1024, interpret=True)["image"]
err = float(jnp.max(jnp.abs(out - ref)))
print(f"max |tpu - interpret| = {err:.2e}", flush=True)
