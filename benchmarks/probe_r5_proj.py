"""Bisect projection's 2.5 ms at bench scale (it should be ~0.1 ms).

Stages accumulate; includes a trivial-op chain to measure the harness
floor (fori_loop dispatch + fetch sync through the axon relay).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.core.camera import camera_from_c2w, look_at_c2w
from humangaussian_tpu.core.sh import eval_sh
from humangaussian_tpu.ops.projection import RasterizeConfig, project_gaussians

N = 100_000
ITERS = int(os.environ.get("ITERS", "10"))
nprng = np.random.RandomState(0)
means = jnp.asarray(nprng.randn(N, 3).astype(np.float32) * 0.5)
scales = jnp.asarray(np.exp(nprng.randn(N, 3).astype(np.float32) * 0.5 - 5.0))
quats = jnp.asarray(nprng.randn(N, 4).astype(np.float32))
feats = jnp.asarray(nprng.randn(N, 1, 3).astype(np.float32) * 0.3)
opas = jnp.asarray((1 / (1 + np.exp(-nprng.randn(N)))).astype(np.float32))
c2w = look_at_c2w(jnp.array([0.0, 0.0, 3.0]), jnp.zeros(3),
                  jnp.array([0.0, 1.0, 0.0]))
cam = camera_from_c2w(c2w, 0.8, 1024, 1024)
cfg = RasterizeConfig(tile=32, max_tiles_per_gaussian=9)
alive = jnp.ones((N,), bool)


def fetch(x):
    return float(jnp.ravel(jax.tree.leaves(x)[0])[0])


def chain(name, fn):
    f = jax.jit(
        lambda x: jax.lax.fori_loop(0, ITERS, lambda i, a: fn(a), x)
    )
    fetch(f(means))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        fetch(f(means))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name}: {best*1e3:.3f} ms", flush=True)


chain("floor (1 madd)", lambda m: m * 1.0000001 + 1e-12)

view = cam.view.astype(jnp.float32)
fp = cam.full_proj.astype(jnp.float32)


def transforms(m):
    mx_, my_, mz_ = m[:, 0], m[:, 1], m[:, 2]

    def xform(mat, j):
        return mx_ * mat[0, j] + my_ * mat[1, j] + mz_ * mat[2, j] + mat[3, j]

    depth = xform(view, 2)
    pw = 1.0 / (xform(fp, 3) + 1e-7)
    px = xform(fp, 0) * pw
    py = xform(fp, 1) * pw
    return m + (depth + px + py)[:, None] * 1e-12


chain("transforms", transforms)


def cov_path(m):
    p = project_gaussians(m, scales, quats, feats, opas, alive, cam, 0,
                          cfg, 1.0, None)
    return m + p.conics[:, :1] * 1e-12


chain("full projection (conic out)", cov_path)


def proj_all(m):
    p = project_gaussians(m, scales, quats, feats, opas, alive, cam, 0,
                          cfg, 1.0, None)
    return m + (jnp.sum(p.means2d) + jnp.sum(p.rect)
                + jnp.sum(p.rgb) + jnp.sum(p.radii)) * 1e-12


chain("full projection (all outs)", proj_all)


def sh_only(m):
    dirs = m / (jnp.linalg.norm(m, axis=-1, keepdims=True) + 1e-12)
    rgb = eval_sh(0, feats, dirs)
    return m + rgb * 1e-12


chain("eval_sh deg0", sh_only)
