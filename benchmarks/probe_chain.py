"""Chained (dependency-serialized) timings: the on-device truth.

Independent repeated calls through the axon relay are unreliable both
ways (memoized when identical, latency-padded when not); chaining N
iterations inside one jit with data dependencies measures real device
throughput."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.core.camera import camera_from_c2w, look_at_c2w
from humangaussian_tpu.ops.projection import RasterizeConfig
import importlib
rt = importlib.import_module("humangaussian_tpu.ops.rasterize_tiled")

rng = np.random.RandomState(0)
n = 100_000
h = w = 1024
MAXT = int(os.environ.get("MAXT", "16"))
ITERS = int(os.environ.get("ITERS", "10"))
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
K = 4096


def render(p):
    return rt.rasterize_tiled(p["means"], p["scales"], p["quats"], p["sh"],
                              p["opacities"], alive, camera, background, 0,
                              cfg, tile_capacity=K)


def chain(step_fn, p, iters):
    def body(i, q):
        out = step_fn(q, i)
        return out
    return jax.lax.fori_loop(0, iters, body, p)


@jax.jit
def fwd_chain(p):
    def step(q, i):
        img = render(q)["image"]
        # feed a scalar of the output back in -> true dependency
        return dict(q, means=q["means"] + img[0, 0, 0] * 1e-12)
    return chain(step, p, ITERS)


@jax.jit
def fb_chain(p):
    def step(q, i):
        def loss(z):
            o = render(z)
            return (jnp.sum(o["image"]) + jnp.sum(o["depth"]) * 1e-3
                    + jnp.sum(o["alpha"]))
        g = jax.grad(loss)(q)
        return jax.tree.map(lambda a, b: a + b * 1e-12, q, g)
    return chain(step, p, ITERS)


def bench(name, f, p):
    out = f(p)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(jax.tree.map(lambda x: x + 1e-6, p))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name}: {dt:.2f} ms/iter", flush=True)


bench("CHAINED full fwd", fwd_chain, params)
bench("CHAINED full fwd+bwd", fb_chain, params)
