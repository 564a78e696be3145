"""Isolate _render_core_bwd from residuals; account for every ms."""
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
starts_c0 = jnp.minimum(pr0.starts[:-1], cs.p_cap)
tileid = jnp.arange(cs.num_tiles, dtype=jnp.int32)
pair_t0 = rt._build_pair_t(fmat0, pr0.order, pr0.sorted_key, cs)
pair_flat0 = pair_t0  # b=1: [16, lanes]
out0 = rt._fwd_call(pair_flat0, pr0.counts, starts_c0, tileid, cs.s)
g_out0 = jnp.ones_like(out0)

res = (pair_flat0, pr0.order[None], pr0.sorted_key[None],
       pr0.perm[None], starts_c0[None], pr0.counts[None], tileid,
       out0)

# full bwd from residuals
def t_bwd(g):
    d = rt._render_core_bwd(cs, None, res, g)
    return g + jnp.sum(d[0][0, ::107, :1]) * 1e-12
chain("core bwd from residuals", t_bwd, g_out0)

# core fwd alone (pair build + kernel)
def t_fwd(fm):
    acc = rt._render_core(fm[None], pr0.order[None], pr0.sorted_key[None],
                          pr0.perm[None], starts_c0[None],
                          pr0.counts[None], tileid, cs, None)
    return fm + jnp.sum(acc[:, 0:5, ::509]) * 1e-12
chain("core fwd alone", t_fwd, fmat0)

# gvec construction alone
def t_gvec(g):
    phi_tot = jnp.sum(out0[:, 0:5, :] * g[:, 0:5, :], axis=1)
    svec = (phi_tot + g[:, 5, :])[:, None, :]
    gvec = jnp.concatenate(
        [g[:, 0:5, :], svec, jnp.zeros_like(svec), jnp.zeros_like(svec)],
        axis=1,
    )
    return g + jnp.sum(gvec[:, :, :1]) * 1e-12
chain("gvec build", t_gvec, g_out0)

# bwd kernel including the zeros alias materialization
pagestart0 = (starts_c0 >> 7) + tileid
gvec0 = jnp.ones((cs.num_tiles, 8, cs.s.pix), jnp.float32)
def t_bwdk(x):
    out = rt._bwd_call(pair_flat0, pr0.counts, starts_c0, tileid,
                       pagestart0, gvec0 + x, cs.c_cap, cs.s)
    return x + jnp.sum(out[::127, ::127]) * 1e-12
chain("bwd kernel w/ zeros alias", t_bwdk, jnp.zeros(()))

# gather+reduce combined (fused?)
pos2_0 = rt._pos2_candidate_order(pr0.sorted_key[None], pr0.perm[None],
                                  pr0.perm.size // N,
                                  cs.p_cap, cs.c_cap, cs.k_cap,
                                  cs.rank_bits, cs.num_tiles)
rows0 = jax.random.normal(ks[5], (cs.c_cap * 128, rt._NF))
r = pr0.perm.size // N
def t_gr(x):
    dpr = x[pos2_0]
    dsorted = jnp.sum(dpr.reshape(N, r, rt._NF), axis=1)
    return x + jnp.sum(dsorted[::97, :1]) * 1e-12
chain("gather+reduce fused", t_gr, rows0)
