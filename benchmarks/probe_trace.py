"""XPlane trace of rasterizer fwd+bwd; prints top ops by self time."""
import os, sys, time, glob, importlib
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from humangaussian_tpu.core.camera import camera_from_c2w, look_at_c2w
from humangaussian_tpu.ops.projection import RasterizeConfig

rt = importlib.import_module("humangaussian_tpu.ops.rasterize_tiled")

N = 100_000
H = W = 1024
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
bg = jnp.zeros((3,))


@jax.jit
def fwdbwd(m):
    def loss(mm):
        out = rt.rasterize_tiled(mm, scales, quats, feats, opas, alive, cam,
                                 bg, 0, cfg, tile_capacity=4096)
        return jnp.sum(out["image"]) + jnp.sum(out["depth"]) * 1e-3
    return jax.grad(loss)(m)


g = fwdbwd(means); jax.block_until_ready(g)
logdir = "/tmp/raster_trace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    for _ in range(3):
        g = fwdbwd(g * 0 + means)
    jax.block_until_ready(g)
print("trace captured", flush=True)

# parse the xplane proto for op durations
from tensorflow.python.profiler.internal import _pywrap_profiler  # noqa
files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print(files)
