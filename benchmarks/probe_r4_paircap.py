"""Pair-capacity tuning A/B at bench scale: the budget bounds the pair
gather + page buffers; live pairs are 237.6k, so headroom above ~1.2x
is pure cost. Checks overflow stays 0 at the tightened budget."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.core.camera import camera_from_c2w, look_at_c2w
from humangaussian_tpu.ops.projection import RasterizeConfig
from humangaussian_tpu.ops.rasterize_tiled import rasterize_tiled

N = 100_000
H = W = 1024
ITERS = 10
nprng = np.random.RandomState(0)
params = dict(
    means=jnp.asarray(nprng.randn(N, 3).astype(np.float32) * 0.5),
    scales=jnp.asarray(np.exp(nprng.randn(N, 3).astype(np.float32) * 0.5 - 5.0)),
    quats=jnp.asarray(nprng.randn(N, 4).astype(np.float32)),
    sh=jnp.asarray(nprng.randn(N, 1, 3).astype(np.float32) * 0.3),
    opacities=jnp.asarray((1 / (1 + np.exp(-nprng.randn(N)))).astype(np.float32)),
)
c2w = look_at_c2w(jnp.array([0.0, 0.0, 3.0]), jnp.zeros(3),
                  jnp.array([0.0, 1.0, 0.0]))
cam = camera_from_c2w(c2w, 0.8, H, W)
alive = jnp.ones((N,), bool)
bg = jnp.zeros((3,))
cfg = RasterizeConfig(tile=32, max_tiles_per_gaussian=9, pair_factor=4)


def fetch(x):
    return float(jnp.ravel(jax.tree.leaves(x)[0])[0])


for pc in [392704, 327680, 281600]:
    def loss(p, pc=pc):
        o = rasterize_tiled(p["means"], p["scales"], p["quats"], p["sh"],
                            p["opacities"], alive, cam, bg, 0, cfg,
                            tile_capacity=4096, pair_capacity=pc)
        return (jnp.sum(o["image"]) + jnp.sum(o["depth"]) * 1e-3
                + jnp.sum(o["alpha"]))

    @jax.jit
    def fb(p, pc=pc):
        def body(i, q):
            g = jax.grad(lambda q2: loss(q2, pc))(q)
            return jax.tree.map(lambda a, b: a + b * 1e-12, q, g)
        return jax.lax.fori_loop(0, ITERS, body, p)

    @jax.jit
    def ovf(p, pc=pc):
        o = rasterize_tiled(p["means"], p["scales"], p["quats"], p["sh"],
                            p["opacities"], alive, cam, bg, 0, cfg,
                            tile_capacity=4096, pair_capacity=pc)
        return o["overflow"]

    fetch(fb(params))
    best = np.inf
    for t in range(3):
        t0 = time.perf_counter()
        fetch(fb(params))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"pair_capacity={pc}: {best*1e3:.2f} ms fwd+bwd "
          f"overflow={int(ovf(params))}", flush=True)
