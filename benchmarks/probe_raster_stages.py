"""Stage bisection of rasterize_tiled fwd+bwd at bench scale (1024^2, 100k)."""
import os, sys, time
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

N = 100_000
H = W = 1024
ITERS = int(os.environ.get("ITERS", "20"))
SCENE = os.environ.get("SCENE", "probe")
if SCENE == "bench":
    # mirror bench.py's fixture exactly (realistic SMPL-X-like scales)
    nprng = np.random.RandomState(0)
    means = jnp.asarray(nprng.randn(N, 3).astype(np.float32) * 0.5)
    scales = jnp.asarray(
        np.exp(nprng.randn(N, 3).astype(np.float32) * 0.5 - 5.0))
    quats = jnp.asarray(nprng.randn(N, 4).astype(np.float32))
    feats = jnp.asarray(nprng.randn(N, 1, 3).astype(np.float32) * 0.3)
    opas = jnp.asarray((1 / (1 + np.exp(-nprng.randn(N, 1)))).astype(np.float32))
    c2w = look_at_c2w(jnp.array([0.0, 0.0, 3.0]), jnp.zeros(3),
                      jnp.array([0.0, 1.0, 0.0]))
    cfg = RasterizeConfig(tile=32, max_tiles_per_gaussian=9, pair_factor=4)
else:
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    means = jax.random.normal(ks[0], (N, 3)) * 0.8
    scales = jnp.log(jnp.abs(jax.random.normal(ks[1], (N, 3))) * 0.02 + 0.004)
    quats = jax.random.normal(ks[2], (N, 4))
    feats = jax.random.uniform(ks[3], (N, 1, 3))
    opas = jax.random.normal(ks[4], (N, 1)) * 0.5
    c2w = look_at_c2w(jnp.array([0.0, -4.0, 0.0]), jnp.zeros(3),
                      jnp.array([0.0, 0.0, 1.0]))
    cfg = RasterizeConfig()
alive = jnp.ones((N,), bool)
cam = camera_from_c2w(c2w, 0.8, H, W)
bg = jnp.zeros((3,))
TC = 4096
# bench scene mirrors bench.py's packed-sort-friendly pair capacity
PC = 392_704 if SCENE == "bench" else None


def chain(name, fn, x0):
    f = jax.jit(lambda x: jax.lax.fori_loop(0, ITERS, lambda i, a: fn(a), x))
    out = f(x0); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = f(x0); jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


cs = rt._core_statics(N, H, W, cfg, TC, PC, False)

# stage 1: projection only
def proj_only(m):
    p = project_gaussians(m, scales, quats, feats, opas, alive, cam, 0, cfg,
                          1.0, None)
    return m + jnp.sum(p.means2d) * 1e-12
chain("projection", proj_only, means)

# stage 2: projection + binning (sort)
def proj_bin(m):
    p = project_gaussians(m, scales, quats, feats, opas, alive, cam, 0, cfg,
                          1.0, None)
    pr = build_pair_lists(p, cs.s.tiles_x, cs.s.tiles_y, TC, cfg,
                          pair_capacity=cs.p_cap)
    return m + (jnp.sum(pr.counts) + jnp.sum(pr.order)).astype(jnp.float32) * 1e-12
chain("projection+binning", proj_bin, means)

# stage 3: + pair build (gather+transpose)
def proj_bin_build(m):
    p = project_gaussians(m, scales, quats, feats, opas, alive, cam, 0, cfg,
                          1.0, None)
    pr = build_pair_lists(p, cs.s.tiles_x, cs.s.tiles_y, TC, cfg,
                          pair_capacity=cs.p_cap)
    fmat = rt._feature_matrix(p)
    pt = rt._build_pair_t(fmat, pr.order, pr.sorted_key, cs)
    return m + jnp.sum(pt[:, ::511]) * 1e-12
chain("projection+binning+pairbuild", proj_bin_build, means)

# stage 4: full fwd
def full_fwd(m):
    out = rt.rasterize_tiled(m, scales, quats, feats, opas, alive, cam, bg,
                             0, cfg, tile_capacity=TC, pair_capacity=PC)
    return m + jnp.sum(out["image"]) * 1e-12
chain("full fwd", full_fwd, means)

# stage 5: full fwd+bwd
def full_fwdbwd(m):
    def loss(mm):
        out = rt.rasterize_tiled(mm, scales, quats, feats, opas, alive, cam,
                                 bg, 0, cfg, tile_capacity=TC,
                                 pair_capacity=PC)
        return jnp.sum(out["image"]) + jnp.sum(out["depth"]) * 1e-3
    g = jax.grad(loss)(m)
    return m + g * 1e-12
chain("full fwd+bwd", full_fwdbwd, means)

# stage 6: pos2 computation alone (the two bwd sorts)
p0 = project_gaussians(means, scales, quats, feats, opas, alive, cam, 0,
                       cfg, 1.0, None)
pr0 = build_pair_lists(p0, cs.s.tiles_x, cs.s.tiles_y, TC, cfg,
                       pair_capacity=cs.p_cap)
sk0, ck0 = pr0.sorted_key, pr0.perm

def pos2_only(x):
    pos2 = rt._pos2_candidate_order(sk0[None], ck0[None], ck0.size // N,
                                    cs.p_cap, cs.c_cap, cs.k_cap,
                                    cs.rank_bits, cs.num_tiles)
    return x + (jnp.sum(pos2) + jnp.sum(sk0) * 0).astype(jnp.float32) * 1e-12
chain("pos2 (bwd sorts)", pos2_only, jnp.zeros(()))

# stage 7: bwd kernel alone (paged write) on prebuilt inputs
fmat0 = rt._feature_matrix(p0)
starts_c0 = jnp.minimum(pr0.starts[:-1], cs.p_cap)
tileid0 = jnp.arange(cs.num_tiles, dtype=jnp.int32)
pair_t0 = rt._build_pair_t(fmat0, pr0.order, sk0, cs)
gvec0 = jnp.ones((cs.num_tiles, 8, cs.s.pix), jnp.float32)
pagestart0 = (starts_c0 >> 7) + tileid0

def bwd_kernel_only(x):
    out = rt._bwd_call(pair_t0 + x * 0, pr0.counts, starts_c0, tileid0,
                       pagestart0, gvec0, cs.c_cap, cs.s)
    return x + jnp.sum(out[::127, ::127]) * 1e-12
chain("bwd kernel (paged)", bwd_kernel_only, jnp.zeros(()))

def fwd_kernel_only(x):
    out = rt._fwd_call(pair_t0 + x * 0, pr0.counts, starts_c0, tileid0, cs.s)
    return x + jnp.sum(out[::127, :, ::127]) * 1e-12
chain("fwd kernel", fwd_kernel_only, jnp.zeros(()))

