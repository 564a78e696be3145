"""Backward stage split for rasterizer v3 + dispatch-floor measurement."""
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
PF = int(os.environ.get("PF", "8"))
cfg = RasterizeConfig(tile=32, max_tiles_per_gaussian=MAXT, pair_factor=PF)
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
print(f"R={cfg.rect_side**2} p_cap={cs.p_cap} c_cap={cs.c_cap}")


def bench(name, f, *args, iters=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)
    return out

# dispatch floor
zz = jnp.zeros((8, 128))
bench("dispatch floor (x+1)", jax.jit(lambda x: x + 1.0), zz, iters=50)

@jax.jit
def stage(p):
    outs = rt._bin_one(p["means"], p["scales"], p["quats"], p["sh"],
                       p["opacities"], alive, camera, 0, cfg, 1.0, None, cs)
    return jax.tree.map(lambda x: x[None], outs)

(prims_b, fmat_b, order_b, skey_b, ckey_b, starts_b, counts_b, ovf_b) = \
    bench("bin stage (proj+sort+fmat)", stage, params)
tileid = jnp.arange(cs.num_tiles, dtype=jnp.int32)

@jax.jit
def core_fwd(fmat_b, order_b, skey_b, ckey_b, starts_b, counts_b):
    return rt._render_core(fmat_b, order_b, skey_b, ckey_b, starts_b,
                           counts_b, tileid, cs, None)

acc = bench("render_core fwd (gather+T+kernel)", core_fwd,
            fmat_b, order_b, skey_b, ckey_b, starts_b, counts_b)

@jax.jit
def core_fb(fmat_b, order_b, skey_b, ckey_b, starts_b, counts_b):
    def loss(f):
        return jnp.sum(rt._render_core(f, order_b, skey_b, ckey_b, starts_b,
                                       counts_b, tileid, cs, None))
    return jax.grad(loss)(fmat_b)

bench("render_core fwd+bwd", core_fb,
      fmat_b, order_b, skey_b, ckey_b, starts_b, counts_b)

# isolate: pair build (gather+transpose)
@jax.jit
def pair_build(fmat_b, order_b, skey_b):
    return jax.vmap(lambda f, o, k: rt._build_pair_t(f, o, k, cs))(
        fmat_b, order_b, skey_b)

pt = bench("pair build (gather+transpose)", pair_build, fmat_b, order_b, skey_b)

# isolate: fwd kernel only
pair_flat = jnp.transpose(pt, (1, 0, 2)).reshape(rt._NF, cs.lanes)
starts_flat = starts_b.reshape(-1)
counts_flat = counts_b.reshape(-1)

@jax.jit
def kfwd(pf, c, st):
    return rt._fwd_call(pf, c, st, tileid, cs.s)

out = bench("fwd kernel only", kfwd, pair_flat, counts_flat, starts_flat)

# isolate: bwd kernel only
pagestart = (starts_flat >> 7) + tileid
gvec = jnp.ones((cs.num_tiles, cs.s.pix, 8), jnp.float32)

@jax.jit
def kbwd(pf, c, st, ps, gv):
    return rt._bwd_call(pf, c, st, tileid, ps, gv, cs.c_cap, cs.s)

bench("bwd kernel only", kbwd, pair_flat, counts_flat, starts_flat,
      pagestart, gvec)

# isolate: pos2 (sorts + scans)
@jax.jit
def pos2(skey_b, ckey_b):
    return jax.vmap(lambda sk, ck: rt._pos2_candidate_order(
        sk, ck, cs.p_cap, cs.c_cap, cs.k_cap, cs.rank_bits, cs.num_tiles))(
        skey_b, ckey_b)

p2 = bench("pos2 (2 sorts + scans)", pos2, skey_b, ckey_b)

# isolate: dpr gather [N*R,16]
rows = jnp.zeros((cs.c_cap * 128, rt._NF), jnp.float32)

@jax.jit
def dpr_gather(rows, p2):
    return rows[p2[0]]

bench("dpr gather (N*R rows)", dpr_gather, rows, p2)
