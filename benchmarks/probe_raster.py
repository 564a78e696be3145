"""Stage-level breakdown of the tiled rasterizer on the bench scene."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.core.camera import camera_from_c2w, look_at_c2w
from humangaussian_tpu.ops.projection import RasterizeConfig, project_gaussians
from humangaussian_tpu.ops.binning import build_pair_lists
import importlib
rt = importlib.import_module("humangaussian_tpu.ops.rasterize_tiled")

rng = np.random.RandomState(0)
n = 100_000
h = w = 1024
MAXT = int(os.environ.get("MAXT", "16"))
cfg = RasterizeConfig(tile=32, max_tiles_per_gaussian=MAXT)
c2w = look_at_c2w(jnp.array([0.0, 0.0, 3.0]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
camera = camera_from_c2w(c2w, 0.8, h, w)
background = jnp.zeros((3,), jnp.float32)
params = dict(
    means=jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.5),
    scales=jnp.asarray(np.exp(rng.randn(n, 3).astype(np.float32) * 0.5 - 5.0)),
    quats=jnp.asarray(rng.randn(n, 4).astype(np.float32)),
    sh=jnp.asarray(rng.randn(n, 1, 3).astype(np.float32) * 0.3),
    opacities=jnp.asarray((1 / (1 + np.exp(-rng.randn(n)))).astype(np.float32)),
)
alive = jnp.ones((n,), bool)
tiles_x = tiles_y = 1024 // 32
num_tiles = tiles_x * tiles_y
K = 4096
P_CAP = rt._resolve_pair_capacity(n, cfg.rect_side ** 2, cfg, None)
print(f"R={cfg.rect_side**2} P_cap={P_CAP}")


def bench(name, f, *args, iters=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)
    return out


@jax.jit
def proj(p):
    return project_gaussians(p["means"], p["scales"], p["quats"], p["sh"],
                             p["opacities"], alive, camera, 0, cfg)

prims = bench("projection", proj, params)

@jax.jit
def binning(p):
    prims = proj(p)
    return build_pair_lists(prims, tiles_x, tiles_y, K, cfg, pair_capacity=P_CAP)

pairs = bench("projection+binning(sort)", binning, params)

counts = np.asarray(pairs.counts)
seg = np.asarray(pairs.starts)
seg_len = seg[1:] - seg[:-1]
print(f"  P={pairs.sorted_rank.shape[0]} live_pairs={counts.sum()} "
      f"counts mean={counts.mean():.0f} max={counts.max()} "
      f"overflow={int(pairs.overflow)}")

@jax.jit
def full_fwd(p):
    return rt.rasterize_tiled(p["means"], p["scales"], p["quats"], p["sh"],
                              p["opacities"], alive, camera, background, 0, cfg,
                              tile_capacity=K)["image"]

bench("FULL fwd", full_fwd, params)

@jax.jit
def full_fb(p):
    def loss(q):
        o = rt.rasterize_tiled(q["means"], q["scales"], q["quats"], q["sh"],
                               q["opacities"], alive, camera, background, 0, cfg,
                               tile_capacity=K)
        return jnp.sum(o["image"]) + jnp.sum(o["depth"]) * 1e-3 + jnp.sum(o["alpha"])
    return jax.grad(loss)(p)["means"]

bench("FULL fwd+bwd", full_fb, params)
