"""Round-5 stage bisection of rasterize_tiled fwd+bwd at bench scale.

Mirrors bench.py's fixture (1024^2, 100k Gaussians, tile=32, mtpg=9,
pair_capacity 327680). Chained timing (data-dependent fori_loop) with a
host scalar fetch for true sync through the axon relay.

Stages (each includes the ones above it, so deltas are stage costs):
  projection            project_gaussians only
  proj+bin              + class sort + expand/cull + (tile,depth) sort
  proj+bin+gather       + the [p_cap,16] pair-feature row gather
  full fwd              + the Pallas compositing kernel
  full fwd+bwd          the whole custom-VJP chain

Env knobs: ITERS, TILE, MTPG, PC, PAIRF.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import importlib

import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.core.camera import camera_from_c2w, look_at_c2w
from humangaussian_tpu.ops.binning import build_pair_lists
from humangaussian_tpu.ops.projection import RasterizeConfig, project_gaussians

rt = importlib.import_module("humangaussian_tpu.ops.rasterize_tiled")

N = int(os.environ.get("N", "100000"))
H = W = 1024
ITERS = int(os.environ.get("ITERS", "25"))
TILE = int(os.environ.get("TILE", "32"))
MTPG = int(os.environ.get("MTPG", "9"))
PC = int(os.environ.get("PC", "327680"))
PAIRF = int(os.environ.get("PAIRF", "4"))

nprng = np.random.RandomState(0)
means = jnp.asarray(nprng.randn(N, 3).astype(np.float32) * 0.5)
scales = jnp.asarray(np.exp(nprng.randn(N, 3).astype(np.float32) * 0.5 - 5.0))
quats = jnp.asarray(nprng.randn(N, 4).astype(np.float32))
feats = jnp.asarray(nprng.randn(N, 1, 3).astype(np.float32) * 0.3)
opas = jnp.asarray((1 / (1 + np.exp(-nprng.randn(N)))).astype(np.float32))
c2w = look_at_c2w(jnp.array([0.0, 0.0, 3.0]), jnp.zeros(3),
                  jnp.array([0.0, 1.0, 0.0]))
cfg = RasterizeConfig(tile=TILE, max_tiles_per_gaussian=MTPG,
                      pair_factor=PAIRF)
alive = jnp.ones((N,), bool)
cam = camera_from_c2w(c2w, 0.8, H, W)
bg = jnp.zeros((3,))
TC = 4096

cs = rt._core_statics(N, H, W, cfg, TC, PC, False)
print(f"tile={TILE} mtpg={MTPG} pc={cs.p_cap} lanes={cs.lanes} "
      f"c_cap={cs.c_cap} num_tiles={cs.num_tiles} dom={cs.dom} "
      f"blocks={cs.blocks} sort_routing={cs.sort_routing}", flush=True)


def fetch(x):
    return float(jnp.ravel(jax.tree.leaves(x)[0])[0])


def chain(name, fn, x0):
    # scalar returned from INSIDE the jit: one relay transfer (the old
    # fetch-a-leaf pattern cost 2-3 round-trips ~ 2.9 ms/iter at 10
    # iters, probe_r5_proj.py floor measurement)
    f = jax.jit(lambda x: jnp.sum(
        jax.lax.fori_loop(0, ITERS, lambda i, a: fn(a), x)[0]))
    fetch(f(x0))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        fetch(f(x0))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name}: {best*1e3:.2f} ms", flush=True)
    return best


chain("harness floor (1 madd)", lambda m: m * 1.0000001 + 1e-12, means)


def proj_only(m):
    p = project_gaussians(m, scales, quats, feats, opas, alive, cam, 0, cfg,
                          1.0, None)
    return m + (jnp.sum(p.means2d) + jnp.sum(p.rect)) * 1e-12


chain("projection", proj_only, means)


def proj_bin(m):
    p = project_gaussians(m, scales, quats, feats, opas, alive, cam, 0, cfg,
                          1.0, None)
    pairs = build_pair_lists(p, cs.s.tiles_x, cs.s.tiles_y, cs.k_cap, cfg,
                             pair_capacity=cs.p_cap, active_cap=cs.n_cap)
    return m + (jnp.sum(pairs.sorted_gid[::511]).astype(jnp.float32)
                + jnp.sum(pairs.counts).astype(jnp.float32)) * 1e-12


chain("proj+bin", proj_bin, means)


def proj_bin_gather(m):
    prims, fmat, order, gid, stile, cand, starts_c, counts, lens, ovf = (
        rt._bin_one(m, scales, quats, feats, opas, alive, cam, 0, cfg, 1.0,
                    None, cs))
    pair_flat, counts_flat, starts_flat = rt._assemble_pairs(
        fmat[None], gid[None], cand[None], starts_c[None], counts[None], cs)
    return m + jnp.sum(pair_flat[:, ::511]) * 1e-12


chain("proj+bin+gather", proj_bin_gather, means)


def full_fwd(m):
    out = rt.rasterize_tiled(m, scales, quats, feats, opas, alive, cam, bg,
                             0, cfg, tile_capacity=TC, pair_capacity=PC)
    return m + jnp.sum(out["image"][::63, ::63]) * 1e-12


chain("full fwd", full_fwd, means)


def full_fwdbwd(m):
    def loss(mm):
        out = rt.rasterize_tiled(mm, scales, quats, feats, opas, alive, cam,
                                 bg, 0, cfg, tile_capacity=TC,
                                 pair_capacity=PC)
        return (jnp.sum(out["image"]) + jnp.sum(out["depth"]) * 1e-3
                + jnp.sum(out["alpha"]))

    g = jax.grad(loss)(m)
    return m + g * 1e-12


chain("full fwd+bwd", full_fwdbwd, means)

# live-pair statistics for domain design
p0 = project_gaussians(means, scales, quats, feats, opas, alive, cam, 0,
                       cfg, 1.0, None)
pairs0 = build_pair_lists(p0, cs.s.tiles_x, cs.s.tiles_y, cs.k_cap, cfg,
                          pair_capacity=cs.p_cap, active_cap=cs.n_cap)
live = int(np.sum(np.asarray(pairs0.counts)))
rw = np.asarray(p0.rect[:, 2] - p0.rect[:, 0])
rh = np.asarray(p0.rect[:, 3] - p0.rect[:, 1])
vis = np.asarray(p0.visible)
area = (rw * rh)[vis]
print(f"live_pairs={live} overflow={int(pairs0.overflow)} "
      f"visible={int(vis.sum())}")
print("rect area histogram (visible):",
      {int(a): int(c) for a, c in
       zip(*np.unique(area, return_counts=True))})
