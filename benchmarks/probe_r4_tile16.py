"""The tile=16 matrix entry (VERDICT r3 ask #1a): honest fwd+bwd timing
at equal 32px-radius-cap semantics (mtpg=25 at tile=16) and at the
16px-cap config (mtpg=9), vs the tile=32 production config.
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
from humangaussian_tpu.ops.rasterize_tiled import rasterize_tiled, _core_statics

N = 100_000
H = W = 1024
ITERS = int(os.environ.get("ITERS", "10"))

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


def fetch(x):
    return float(jnp.ravel(jax.tree.leaves(x)[0])[0])


for tile, mtpg, bigcap, pc in [
    (16, 9, None, 524288),      # 16px radius cap (tighter than CUDA)
    (16, 25, 65536, 786432),    # 32px cap = tile-32 bench semantics
]:
    cfg = RasterizeConfig(tile=tile, max_tiles_per_gaussian=mtpg,
                          pair_factor=8, big_capacity=bigcap)
    cs = _core_statics(N, H, W, cfg, 4096, pc, False)
    print(f"tile={tile} mtpg={mtpg} dom={cs.dom} p_cap={cs.p_cap} "
          f"b_cap={cs.b_cap} tiles={cs.num_tiles} "
          f"sort_routing={cs.sort_routing}", flush=True)

    def loss(p, cfg=cfg, pc=pc):
        o = rasterize_tiled(p["means"], p["scales"], p["quats"], p["sh"],
                            p["opacities"], alive, cam, bg, 0, cfg,
                            tile_capacity=4096, pair_capacity=pc)
        return (jnp.sum(o["image"]) + jnp.sum(o["depth"]) * 1e-3
                + jnp.sum(o["alpha"]))

    @jax.jit
    def fb_chain(p, cfg=cfg, pc=pc):
        def body(i, q):
            g = jax.grad(lambda q2: loss(q2, cfg, pc))(q)
            return jax.tree.map(lambda a, b: a + b * 1e-12, q, g)
        return jax.lax.fori_loop(0, ITERS, body, p)

    @jax.jit
    def ovf(p, cfg=cfg, pc=pc):
        o = rasterize_tiled(p["means"], p["scales"], p["quats"], p["sh"],
                            p["opacities"], alive, cam, bg, 0, cfg,
                            tile_capacity=4096, pair_capacity=pc)
        return o["overflow"]

    print(f"  overflow={int(ovf(params))}", flush=True)
    fetch(fb_chain(params))
    best = np.inf
    for t in range(3):
        t0 = time.perf_counter()
        fetch(fb_chain(params))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"  fwd+bwd: {best*1e3:.2f} ms ({H*W/best/1e6:.1f} Mrays/s)",
          flush=True)
