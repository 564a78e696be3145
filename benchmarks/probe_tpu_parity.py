"""Replay the committed CPU-oracle parity fixtures on the REAL TPU.

The CPU test suite proves algorithmic parity at 2e-6; this probe
measures what the HARDWARE adds (NUMERICS.md layer 1-2): Mosaic/XLA:TPU
transcendental + division approximations. Round-4 reference numbers
(post Newton-log1p fix), worst element:

  scene_dense_96 (depth complexity ~150): img ~8e-2 alpha ~1.3e-1 vs
  the CPU fixture — of which the SHARED XLA:TPU projection/oracle error
  is ~everything: the kernel tracks the XLA:TPU oracle at 4.6e-3 / 7.6e-5.

Run on a TPU-attached host: python benchmarks/probe_tpu_parity.py
"""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
print("backend:", jax.default_backend())
from humangaussian_tpu.core.camera import camera_from_c2w
from humangaussian_tpu.ops.projection import RasterizeConfig
from humangaussian_tpu.ops.rasterize_tiled import rasterize_tiled
for path in sorted(glob.glob(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures", "cuda", "*.npz"))):
    fx = np.load(path)
    n = fx["means"].shape[0]; h, w = int(fx["height"]), int(fx["width"])
    cam = camera_from_c2w(jnp.asarray(fx["c2w"]), float(fx["fovy"]), h, w)
    cfg = RasterizeConfig(tile=32, max_tiles_per_gaussian=16)
    alive = jnp.ones((n,), bool)
    params = dict(means=jnp.asarray(fx["means"]), scales=jnp.asarray(fx["scales"]),
        quats=jnp.asarray(fx["quats"]), sh=jnp.asarray(fx["sh"]),
        opacities=jnp.asarray(fx["opacities"]),
        off=jnp.zeros((n,2), jnp.float32))
    def render(p):
        return rasterize_tiled(p["means"], p["scales"], p["quats"], p["sh"],
            p["opacities"], alive, cam, jnp.asarray(fx["background"]),
            int(fx["sh_degree"]), cfg, means2d_offset=p["off"],
            pair_capacity=16*n)
    o = render(params)
    def loss(p):
        o = render(p)
        return (jnp.sum(o["image"]*fx["g_image"]) + jnp.sum(o["depth"]*fx["g_depth"])
                + jnp.sum(o["alpha"]*fx["g_alpha"]))
    g = jax.grad(loss)(params)
    di = float(jnp.max(jnp.abs(o["image"]-fx["image"])))
    da = float(jnp.max(jnp.abs(o["alpha"]-fx["alpha"])))
    gl = []
    for k, gk in [("means","d_means"),("scales","d_scales"),("quats","d_quats"),
                  ("sh","d_sh"),("opacities","d_opacities"),("off","d_means2d")]:
        ref = fx[gk]; sc = max(float(np.max(np.abs(ref))), 1e-20)
        gl.append(f"{k}={float(jnp.max(jnp.abs(g[k]-ref)))/sc:.1e}")
    print(f"{path.split('/')[-1]}: img={di:.2e} alpha={da:.2e} grads[{' '.join(gl)}]", flush=True)
