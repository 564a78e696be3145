"""Dense-scene budget-truncation fidelity at REAL training scale.

VERDICT r2 #3: quantify what the deepest-first pair drops do to the
image at post-densification density. Builds the same synthetic 437k
scene as probe_train_scale.py, renders one 1024^2 view at the training
budgets (tile_capacity ladder rungs, pair_factor 4) against an ample
render (tile_capacity 16384, pair_factor = r so the pair budget cannot
truncate), and reports dropped pairs + PSNR per rung.

  ALIVE=437000 python benchmarks/probe_dense_fidelity.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.core.camera import camera_from_c2w, look_at_c2w
from humangaussian_tpu.core.scene import scene_from_points
from humangaussian_tpu.ops.projection import RasterizeConfig
from humangaussian_tpu.ops.rasterize_tiled import rasterize_tiled
from humangaussian_tpu.smplx.model import toy_model
from humangaussian_tpu.smplx.skeleton import Skeleton

ALIVE = int(os.environ.get("ALIVE", "437000"))
CAPACITY = 1 << 19

rng = jax.random.PRNGKey(0)
skel = Skeleton(style="humansd", apose=True).load_smplx(toy_model()).scale(-10)
pts = skel.sample_smplx_points(100_000, seed=2)
scene = scene_from_points(
    jnp.asarray(pts), jnp.full((100_000, 3), 0.5), CAPACITY,
    init_opacity=0.7,
)
n0 = 100_000
if ALIVE > n0:
    k = jax.random.PRNGKey(1)
    src = jax.random.randint(k, (ALIVE - n0,), 0, n0)

    def grow(x):
        if x.ndim >= 1 and x.shape[0] == CAPACITY:
            upd = x[src]
            if x.dtype in (jnp.float32, jnp.bfloat16) and x.ndim >= 2:
                upd = upd + 0.01 * jax.random.normal(k, upd.shape, x.dtype)
            return x.at[n0:ALIVE].set(upd)
        return x

    scene = jax.tree.map(grow, scene)
    scene = scene._replace(alive=jnp.arange(CAPACITY) < ALIVE)

c2w = look_at_c2w(
    jnp.array([0.0, 0.3, 2.2]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])
)
cam = camera_from_c2w(c2w, 0.8, 1024, 1024)
bg = jnp.zeros((3,), jnp.float32)
bucket = 491520


def render(tile_capacity, pair_factor):
    cfg = RasterizeConfig(tile=32, max_tiles_per_gaussian=4,
                          pair_factor=pair_factor)

    @jax.jit
    def f(sc):
        return rasterize_tiled(
            sc.means, sc.scales, sc.quats, sc.features, sc.opacities,
            sc.alive, cam, bg, 0, cfg, tile_capacity=tile_capacity,
            active_cap=bucket,
        )

    out = f(scene)
    return (np.asarray(out["image"]), int(out["overflow"]))


ample_img, ample_drop = render(16384, 4)  # pair_factor 4 = r: no budget cut
print(f"ample render (cap 16384): dropped {ample_drop}", flush=True)
rows = []
for cap in (4096, 6144, 8192):
    img, dropped = render(cap, 4)
    mse = float(np.mean((img - ample_img) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    rows.append({"tile_capacity": cap, "dropped_pairs": dropped,
                 "psnr_vs_ample_db": round(psnr, 1)})
    print(json.dumps(rows[-1]), flush=True)
print(json.dumps({"alive": ALIVE, "ample_dropped": ample_drop,
                  "rungs": rows}))
