"""Round-4 stage bisection of rasterize_tiled fwd+bwd at bench scale.

Mirrors bench.py's fixture exactly (1024^2, 100k Gaussians, tile=32,
mtpg=9, pair_capacity 392704). Chained timing (data-dependent fori_loop)
with a host scalar fetch for true sync through the axon relay.

Env knobs: ITERS (default 20), TILE (32), MTPG (9), PC (392704),
PANEL ("exact"|"mxu"), CUMSUM_BF16 (0|1).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.core.camera import camera_from_c2w, look_at_c2w
from humangaussian_tpu.ops.projection import RasterizeConfig, project_gaussians
import importlib
rt = importlib.import_module("humangaussian_tpu.ops.rasterize_tiled")

N = 100_000
H = W = 1024
ITERS = int(os.environ.get("ITERS", "20"))
TILE = int(os.environ.get("TILE", "32"))
MTPG = int(os.environ.get("MTPG", "9"))
PC = int(os.environ.get("PC", "392704"))
PANEL = os.environ.get("PANEL", "exact")
CBF16 = bool(int(os.environ.get("CUMSUM_BF16", "0")))

nprng = np.random.RandomState(0)
means = jnp.asarray(nprng.randn(N, 3).astype(np.float32) * 0.5)
scales = jnp.asarray(np.exp(nprng.randn(N, 3).astype(np.float32) * 0.5 - 5.0))
quats = jnp.asarray(nprng.randn(N, 4).astype(np.float32))
feats = jnp.asarray(nprng.randn(N, 1, 3).astype(np.float32) * 0.3)
opas = jnp.asarray((1 / (1 + np.exp(-nprng.randn(N)))).astype(np.float32))
c2w = look_at_c2w(jnp.array([0.0, 0.0, 3.0]), jnp.zeros(3),
                  jnp.array([0.0, 1.0, 0.0]))
cfg = RasterizeConfig(tile=TILE, max_tiles_per_gaussian=MTPG, pair_factor=4,
                      panel_math=PANEL, cumsum_bf16=CBF16)
alive = jnp.ones((N,), bool)
cam = camera_from_c2w(c2w, 0.8, H, W)
bg = jnp.zeros((3,))
TC = 4096

cs = rt._core_statics(N, H, W, cfg, TC, PC, False)
print(f"tile={TILE} mtpg={MTPG} pc={cs.p_cap} lanes={cs.lanes} "
      f"c_cap={cs.c_cap} num_tiles={cs.num_tiles} dom={cs.dom} "
      f"sort_routing={cs.sort_routing} panel={PANEL} cbf16={CBF16}",
      flush=True)


def fetch(x):
    return float(jnp.ravel(jax.tree.leaves(x)[0])[0])


def chain(name, fn, x0):
    f = jax.jit(lambda x: jax.lax.fori_loop(0, ITERS, lambda i, a: fn(a), x))
    fetch(f(x0))
    best = np.inf
    for t in range(3):
        t0 = time.perf_counter()
        fetch(f(x0))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name}: {best*1e3:.2f} ms", flush=True)
    return best


# stage 1: projection only
def proj_only(m):
    p = project_gaussians(m, scales, quats, feats, opas, alive, cam, 0, cfg,
                          1.0, None)
    return m + jnp.sum(p.means2d) * 1e-12
chain("projection", proj_only, means)

# stage 2: projection + depth sort + expand/cull + big pair sort
def proj_sorts(m):
    p, fmat, rect_f, dkey = rt._bin_one(
        m, scales, quats, feats, opas, alive, cam, 0, cfg, 1.0, None, cs)
    order, skey, cand, pair_t, starts_c, counts, lens, ovf = (
        rt._sort_camera_pairs(fmat, rect_f, dkey, cs))
    return m + (jnp.sum(pair_t[:, ::511]) + jnp.sum(counts).astype(
        jnp.float32)) * 1e-12
chain("projection+sorts(pair build)", proj_sorts, means)

# stage 3: full fwd
def full_fwd(m):
    out = rt.rasterize_tiled(m, scales, quats, feats, opas, alive, cam, bg,
                             0, cfg, tile_capacity=TC, pair_capacity=PC)
    return m + jnp.sum(out["image"]) * 1e-12
chain("full fwd", full_fwd, means)

# stage 4: full fwd+bwd
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

# prebuilt inputs for kernel-only stages
p0, fmat0, rect0, dkey0 = rt._bin_one(
    means, scales, quats, feats, opas, alive, cam, 0, cfg, 1.0, None, cs)
(order0, skey0, cand0, pair_t0, starts_c0, counts0, lens0, ovf0) = (
    rt._sort_camera_pairs(fmat0, rect0, dkey0, cs))
print(f"live_pairs={int(jnp.sum(counts0))} overflow={int(ovf0)}", flush=True)
tileid0 = jnp.arange(cs.num_tiles, dtype=jnp.int32)
pair_flat0 = pair_t0

def fwd_kernel_only(x):
    out = rt._fwd_call(pair_flat0, counts0, starts_c0 + (x * 0).astype(
        jnp.int32), tileid0, cs.s)
    return x + jnp.sum(out[::127, :, ::127]) * 1e-12
chain("fwd kernel", fwd_kernel_only, jnp.zeros(()))

pagestart0 = (starts_c0 >> 7) + tileid0
gvec0 = jnp.ones((cs.num_tiles, 8, cs.s.pix), jnp.float32)

def bwd_kernel_only(x):
    out = rt._bwd_call(pair_flat0, counts0, starts_c0 + (x * 0).astype(
        jnp.int32), tileid0, pagestart0, lens0, gvec0, cs.c_cap, cs.s,
        cs.sort_routing)
    return x + jnp.sum(out[::1023, ::127]) * 1e-12
chain("bwd kernel (paged)", bwd_kernel_only, jnp.zeros(()))

# routing-only: elementwise pos2 + page gather + carry-back payload sort
skey_b0 = skey0[None]
cand_b0 = cand0[None]
dpaged0 = jnp.ones((cs.c_cap * rt._NF, 128), jnp.float32)

def routing_only(x):
    pos2, covered = rt._page_positions(
        skey_b0 + (x * 0).astype(jnp.int32), cs)
    rows = (dpaged0.reshape(cs.c_cap, rt._NF, 128)
            .transpose(0, 2, 1).reshape(cs.c_cap * 128, rt._NF))
    dpr = rows[pos2[0, :cs.p_cap]]
    ops = (cand_b0[0],) + tuple(
        jnp.pad(dpr[:, k], (0, cs.dom - cs.p_cap)) for k in range(10))
    srt = jax.lax.sort(ops, num_keys=1)
    red = [jnp.sum(c.reshape(cs.r, cs.n_cap), axis=0) for c in srt[1:]]
    return x + jnp.sum(red[0][::511]) * 1e-12
chain("bwd routing (gather + carry sort)", routing_only, jnp.zeros(()))
