"""Quantify whole-tile early-stop headroom at bench scale.

Reads the fwd kernel's executed-chunk diagnostic (out row 6) and
compares against the static ceil(count/128) chunk budget — the gap is
what finer-grained (pixel-row-group) early-stop could recover.
"""
import os, sys
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
from humangaussian_tpu.ops.binning import build_pair_lists
from humangaussian_tpu.ops.projection import project_gaussians

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
cfg = RasterizeConfig(tile=32, max_tiles_per_gaussian=9, pair_factor=4)
alive = jnp.ones((N,), bool)
cam = camera_from_c2w(c2w, 0.8, H, W)
TC = 4096
PC = 392_704

cs = rt._core_statics(N, H, W, cfg, TC, PC, False)
prims, fmat, *_ = rt._bin_one(means, scales, quats, feats, opas, alive,
                              cam, 0, cfg, 1.0, None, cs)
pairs = build_pair_lists(prims, cs.s.tiles_x, cs.s.tiles_y, TC, cfg,
                         pair_capacity=cs.p_cap, active_cap=cs.n_cap)
starts_c = jnp.minimum(pairs.starts[:-1], cs.p_cap)
tileid = jnp.arange(cs.num_tiles, dtype=jnp.int32)
pair_flat, counts_flat, starts_flat = rt._assemble_pairs(
    fmat[None], pairs.sorted_gid[None], pairs.cand[None], starts_c[None],
    pairs.counts[None], cs)
acc = rt._fwd_call(pair_flat, counts_flat, starts_flat, tileid, cs.s)
kfin = np.asarray(acc[:, 6, 0])  # executed chunks per tile
counts = np.asarray(pairs.counts)
static_chunks = np.ceil(counts / 128)
print(f"static chunks: {static_chunks.sum():.0f}")
print(f"executed chunks: {kfin.sum():.0f} "
      f"({kfin.sum()/max(static_chunks.sum(),1)*100:.1f}% of static)")
print(f"tiles stopping early: {(kfin < static_chunks).sum()} / {len(kfin)}")
# per-pixel ideal: chunk at which each pixel saturates. Use final logT
# to see saturation prevalence instead (cheap proxy):
logt = np.asarray(acc[:, 5, :])
sat = (logt < np.log(1e-4)).mean()
print(f"fraction of pixels saturated at end: {sat*100:.1f}%")
print(f"counts: mean {counts.mean():.0f}  p50 {np.percentile(counts,50):.0f} "
      f"p90 {np.percentile(counts,90):.0f}  max {counts.max()}")
