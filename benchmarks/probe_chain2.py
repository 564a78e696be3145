"""Chained component timings for the v3 rasterizer (device truth)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.core.camera import camera_from_c2w, look_at_c2w
from humangaussian_tpu.ops.projection import RasterizeConfig, project_gaussians
from humangaussian_tpu.ops.binning import build_pair_lists
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
params = dict(
    means=jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.5),
    scales=jnp.asarray(np.exp(rng.randn(n, 3).astype(np.float32) * 0.5 - 5.0)),
    quats=jnp.asarray(rng.randn(n, 4).astype(np.float32)),
    sh=jnp.asarray(rng.randn(n, 1, 3).astype(np.float32) * 0.3),
    opacities=jnp.asarray((1 / (1 + np.exp(-rng.randn(n)))).astype(np.float32)),
)
alive = jnp.ones((n,), bool)
K = 4096
cs = rt._core_statics(n, h, w, cfg, K, None, False)
tileid = jnp.arange(cs.num_tiles, dtype=jnp.int32)


def bench_chain(name, make_step, init):
    """make_step(x, i) -> x' chained ITERS times inside one jit."""
    @jax.jit
    def run(x0):
        return jax.lax.fori_loop(0, ITERS, lambda i, x: make_step(x, i), x0)
    out = run(init)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(jax.tree.map(lambda a: a + 1e-6 if a.dtype == jnp.float32 else a, init))
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/ITERS*1e3:.2f} ms", flush=True)
    return out


# 1. bin stage
def bin_step(p, i):
    outs = rt._bin_one(p["means"], p["scales"], p["quats"], p["sh"],
                       p["opacities"], alive, camera, 0, cfg, 1.0, None, cs)
    fmat = outs[1]
    return dict(p, means=p["means"] + fmat[0, 0] * 1e-12)

bench_chain("bin stage (proj+sort+fmat)", bin_step, params)

# precompute one bin result for downstream stages
stage = jax.jit(lambda p: jax.tree.map(
    lambda x: x[None],
    rt._bin_one(p["means"], p["scales"], p["quats"], p["sh"],
                p["opacities"], alive, camera, 0, cfg, 1.0, None, cs)))
(prims_b, fmat_b, order_b, skey_b, ckey_b, starts_b, counts_b, ovf_b) = stage(params)

# 2. pair build
def pb_step(f, i):
    pt = jax.vmap(lambda a, o, k: rt._build_pair_t(a, o, k, cs))(f, order_b, skey_b)
    return f + pt[0, 0, 0] * 1e-12

bench_chain("pair build (gather+T)", pb_step, fmat_b)

pt = jax.jit(lambda f: jax.vmap(
    lambda a, o, k: rt._build_pair_t(a, o, k, cs))(f, order_b, skey_b))(fmat_b)
pair_flat = jnp.transpose(pt, (1, 0, 2)).reshape(rt._NF, cs.lanes)
starts_flat = starts_b.reshape(-1)
counts_flat = counts_b.reshape(-1)

# 3. fwd kernel
def fwd_step(pf, i):
    acc = rt._fwd_call(pf, counts_flat, starts_flat, tileid, cs.s)
    return pf + acc[0, 0, 0] * 1e-12

bench_chain("fwd kernel", fwd_step, pair_flat)

# 4. bwd kernel
pagestart = (starts_flat >> 7) + tileid
gvec = jnp.ones((cs.num_tiles, cs.s.pix, 8), jnp.float32)

def bwd_step(pf, i):
    d = rt._bwd_call(pf, counts_flat, starts_flat, tileid, pagestart, gvec,
                     cs.c_cap, cs.s)
    return pf + d[0, 0] * 1e-12

bench_chain("bwd kernel", bwd_step, pair_flat)

# 5. pos2
def pos2_step(sk, i):
    p2 = jax.vmap(lambda a, ck: rt._pos2_candidate_order(
        a, ck, cs.p_cap, cs.c_cap, cs.k_cap, cs.rank_bits, cs.num_tiles))(
        sk, ckey_b)
    return sk ^ (p2[:, :1] & 0)  # dependency, no value change

bench_chain("pos2 (2 sorts + scans)", pos2_step, skey_b)

p2 = jax.jit(lambda sk: jax.vmap(lambda a, ck: rt._pos2_candidate_order(
    a, ck, cs.p_cap, cs.c_cap, cs.k_cap, cs.rank_bits, cs.num_tiles))(
    sk, ckey_b))(skey_b)

# 6. dpr gather
rows = jax.random.normal(jax.random.PRNGKey(0), (cs.c_cap * 128, rt._NF))

def dpr_step(r, i):
    d = r[p2[0]]
    s = jnp.sum(d.reshape(n, -1, rt._NF), axis=1)
    return r.at[0, 0].add(s[0, 0] * 1e-12)

bench_chain("dpr gather + rank sum", dpr_step, rows)

# 7. projection alone
def proj_step(p, i):
    pr = project_gaussians(p["means"], p["scales"], p["quats"], p["sh"],
                           p["opacities"], alive, camera, 0, cfg)
    return dict(p, means=p["means"] + pr.depths[0] * 1e-12)

bench_chain("projection", proj_step, params)
