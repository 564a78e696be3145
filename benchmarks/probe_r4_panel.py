"""A/B the panel_math / cumsum_bf16 kernel modes at bench scale.

For each config: full fwd+bwd chained time, plus max|delta| of outputs
and parameter gradients vs the exact/f32 config (error table feeds
NUMERICS.md).
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
from humangaussian_tpu.ops.rasterize_tiled import rasterize_tiled

N = 100_000
H = W = 1024
ITERS = int(os.environ.get("ITERS", "20"))
PC = 392_704
TC = 4096

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


def make(panel, cbf16):
    cfg = RasterizeConfig(tile=32, max_tiles_per_gaussian=9, pair_factor=4,
                          panel_math=panel, cumsum_bf16=cbf16)

    def render(p):
        return rasterize_tiled(p["means"], p["scales"], p["quats"], p["sh"],
                               p["opacities"], alive, cam, bg, 0, cfg,
                               tile_capacity=TC, pair_capacity=PC)

    def loss(p):
        o = render(p)
        return (jnp.sum(o["image"]) + jnp.sum(o["depth"]) * 1e-3
                + jnp.sum(o["alpha"]))

    @jax.jit
    def fb_chain(p):
        def body(i, q):
            g = jax.grad(loss)(q)
            return jax.tree.map(lambda a, b: a + b * 1e-12, q, g)
        return jax.lax.fori_loop(0, ITERS, body, p)

    @jax.jit
    def outputs(p):
        o = render(p)
        g = jax.grad(loss)(p)
        return o["image"], o["depth"], o["alpha"], g

    return fb_chain, outputs


def fetch(x):
    return float(jnp.ravel(jax.tree.leaves(x)[0])[0])


ref_out = None
for panel, cbf16 in [("exact", False), ("mxu", False), ("exact", True),
                     ("mxu", True)]:
    fb, outs = make(panel, cbf16)
    fetch(fb(params))
    best = np.inf
    for t in range(3):
        t0 = time.perf_counter()
        fetch(fb(params))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    o = jax.tree.map(np.asarray, outs(params))
    if ref_out is None:
        ref_out = o
        err = "reference"
    else:
        img_e = np.max(np.abs(o[0] - ref_out[0]))
        dep_e = np.max(np.abs(o[1] - ref_out[1]))
        alp_e = np.max(np.abs(o[2] - ref_out[2]))
        lines = []
        for k in o[3]:
            a, b = o[3][k], ref_out[3][k]
            scale = max(np.max(np.abs(b)), 1e-20)
            lines.append(f"{k}={np.max(np.abs(a - b)) / scale:.2e}")
        err = (f"img={img_e:.2e} depth={dep_e:.2e} alpha={alp_e:.2e} "
               f"relgrad[{' '.join(lines)}]")
    print(f"panel={panel:5s} cumsum_bf16={int(cbf16)}: "
          f"{best*1e3:.2f} ms fwd+bwd | {err}", flush=True)
