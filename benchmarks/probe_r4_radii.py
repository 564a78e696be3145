"""Bench-scene radius distribution + pair counts at tile=16 vs 32."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from humangaussian_tpu.core.camera import camera_from_c2w, look_at_c2w
from humangaussian_tpu.ops.projection import RasterizeConfig, project_gaussians
from humangaussian_tpu.ops.binning import build_pair_lists

N = 100_000
H = W = 1024
nprng = np.random.RandomState(0)
means = jnp.asarray(nprng.randn(N, 3).astype(np.float32) * 0.5)
scales = jnp.asarray(np.exp(nprng.randn(N, 3).astype(np.float32) * 0.5 - 5.0))
quats = jnp.asarray(nprng.randn(N, 4).astype(np.float32))
feats = jnp.asarray(nprng.randn(N, 1, 3).astype(np.float32) * 0.3)
opas = jnp.asarray((1 / (1 + np.exp(-nprng.randn(N)))).astype(np.float32))
c2w = look_at_c2w(jnp.array([0.0, 0.0, 3.0]), jnp.zeros(3),
                  jnp.array([0.0, 1.0, 0.0]))
cam = camera_from_c2w(c2w, 0.8, H, W)
alive = jnp.ones((N,), bool)

for tile, mtpg in [(32, 9), (16, 9), (16, 16), (16, 25)]:
    cfg = RasterizeConfig(tile=tile, max_tiles_per_gaussian=mtpg)
    p = project_gaussians(means, scales, quats, feats, opas, alive, cam, 0,
                          cfg, 1.0, None)
    radii = np.asarray(p.radii)
    vis = np.asarray(p.visible)
    rv = radii[vis]
    rect = np.asarray(p.rect)
    area = np.maximum(rect[:, 2] - rect[:, 0], 0) * np.maximum(
        rect[:, 3] - rect[:, 1], 0)
    pr = build_pair_lists(p, W // tile, H // tile, 4096, cfg)
    live = int(jnp.sum(pr.counts))
    q = np.percentile(rv, [50, 75, 90, 95, 99]) if rv.size else []
    print(f"tile={tile} mtpg={mtpg} cap={cfg.max_radius_px:.0f}px "
          f"visible={vis.sum()} radii_pct(50/75/90/95/99)={q} "
          f"rect>4slots={(area[vis] > 4).sum()} rect>9={(area[vis] > 9).sum()} "
          f"rect_area_sum={area[vis].sum()} live_pairs(culled)={live}",
          flush=True)
