"""Bisection of the rasterizer BACKWARD: which data-movement op eats time."""
import os, sys, time, importlib
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.core.camera import camera_from_c2w, look_at_c2w
from humangaussian_tpu.ops.projection import RasterizeConfig, project_gaussians
from humangaussian_tpu.ops.binning import build_pair_lists

rt = importlib.import_module("humangaussian_tpu.ops.rasterize_tiled")

N = 100_000
H = W = 1024
ITERS = int(os.environ.get("ITERS", "20"))
rng = jax.random.PRNGKey(0)
ks = jax.random.split(rng, 6)
means = jax.random.normal(ks[0], (N, 3)) * 0.8
scales = jnp.log(jnp.abs(jax.random.normal(ks[1], (N, 3))) * 0.02 + 0.004)
quats = jax.random.normal(ks[2], (N, 4))
feats = jax.random.uniform(ks[3], (N, 1, 3))
opas = jax.random.normal(ks[4], (N, 1)) * 0.5
alive = jnp.ones((N,), bool)
c2w = look_at_c2w(jnp.array([0.0, -4.0, 0.0]), jnp.zeros(3),
                  jnp.array([0.0, 0.0, 1.0]))
cam = camera_from_c2w(c2w, 0.8, H, W)
cfg = RasterizeConfig()
TC = 4096
cs = rt._core_statics(N, H, W, cfg, TC, None, False)


def chain(name, fn, x0):
    f = jax.jit(lambda x: jax.lax.fori_loop(0, ITERS, lambda i, a: fn(a), x))
    out = f(x0); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = f(x0); jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)


p0 = project_gaussians(means, scales, quats, feats, opas, alive, cam, 0,
                       cfg, 1.0, None)
pr0 = build_pair_lists(p0, cs.s.tiles_x, cs.s.tiles_y, TC, cfg,
                       pair_capacity=cs.p_cap)
fmat0 = rt._feature_matrix(p0)
b = 1
n = N
r = pr0.perm.size // n
print(f"p_cap={cs.p_cap} c_cap={cs.c_cap} r={r} lanes={cs.lanes}", flush=True)

dpaged0 = jax.random.normal(ks[5], (b * cs.c_cap * rt._NF, 128))
pos2_0 = rt._pos2_candidate_order(pr0.sorted_key[None], pr0.perm[None],
                                  pr0.perm.size // N,
                                  cs.p_cap, cs.c_cap, cs.k_cap,
                                  cs.rank_bits, cs.num_tiles)

# A. paged -> pair-major transpose
def t_transpose(x):
    rows = (x.reshape(b * cs.c_cap, rt._NF, 128).transpose(0, 2, 1)
            .reshape(b * cs.c_cap * 128, rt._NF))
    return x + jnp.sum(rows[::1013]) * 1e-12
chain("A transpose paged->rows", t_transpose, dpaged0)

rows0 = (dpaged0.reshape(b * cs.c_cap, rt._NF, 128).transpose(0, 2, 1)
         .reshape(b * cs.c_cap * 128, rt._NF))

# B. the candidate gather dof[pos2]  [N*r rows of 16]
def t_gather(x):
    dpr = x[pos2_0]
    return x + jnp.sum(dpr[::997]) * 1e-12
chain("B gather dof[pos2] (N*r rows)", t_gather, rows0)

# C. reshape-reduce over r + inv_order sort + final gather
dpr0 = rows0[pos2_0]
def t_reduce(x):
    dsorted = jnp.sum(x.reshape(n, r, rt._NF), axis=1)
    iota_n = jnp.arange(n, dtype=jnp.int32)
    _, inv_order = jax.lax.sort((pr0.order, iota_n), num_keys=1)
    return x + jnp.sum(dsorted[inv_order][::97]) * 1e-12
chain("C reduce r + inv sort/gather", t_reduce, dpr0)

# D. core-only VJP (fmat cotangent), excludes projection VJP
tileid = jnp.arange(cs.num_tiles, dtype=jnp.int32)
starts_c0 = jnp.minimum(pr0.starts[:-1], cs.p_cap)
def core(fm):
    acc = rt._render_core(fm[None], pr0.order[None], pr0.sorted_key[None],
                          pr0.perm[None], starts_c0[None],
                          pr0.counts[None], tileid, cs, None)
    return jnp.sum(acc[:, 0:5, :])
def t_core_vjp(fm):
    g = jax.grad(core)(fm)
    return fm + g * 1e-9
chain("D core fwd+bwd (no projection vjp)", t_core_vjp, fmat0)

# E. projection + feature-matrix VJP alone
def projloss(m):
    p = project_gaussians(m, scales, quats, feats, opas, alive, cam, 0,
                          cfg, 1.0, None)
    fm = rt._feature_matrix(p)
    return jnp.sum(fm * fmat0)
def t_proj_vjp(m):
    g = jax.grad(projloss)(m)
    return m + g * 1e-12
chain("E projection fwd+vjp", t_proj_vjp, means)

# F. gather in sorted order only (p_cap rows) for comparison
idx_sorted = jnp.arange(cs.p_cap, dtype=jnp.int32) % (b * cs.c_cap * 128)
def t_gather_sorted(x):
    dpr = x[idx_sorted]
    return x + jnp.sum(dpr[::997]) * 1e-12
chain("F gather p_cap contiguous rows", t_gather_sorted, rows0)
