"""XPlane trace of the SD2 dual-branch UNet forward (24 latents)."""
import os, sys, glob
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from humangaussian_tpu.guidance.unet import DualBranchUNet, SD2_BASE_CONFIG

rng = jax.random.PRNGKey(0)
unet = DualBranchUNet(SD2_BASE_CONFIG)
x1 = jnp.zeros((1, 64, 64, 8))
up = jax.jit(unet.init)(rng, x1, x1, jnp.zeros((1,)), jnp.zeros((1, 77, 1024)), jnp.zeros((1, 6)))
up = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, up)

B3 = 24
xb = jax.random.normal(rng, (B3, 64, 64, 8))
ctx = jax.random.normal(rng, (B3, 77, 1024))
t = jnp.full((B3,), 500.0)
tids = jnp.ones((B3, 6))


@jax.jit
def fwd(p, x):
    return unet.apply(p, x, x, t, ctx, tids)


o = fwd(up, xb); jax.block_until_ready(o)
logdir = "/tmp/unet_trace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    for _ in range(2):
        o = fwd(up, xb + o[..., :8] * 1e-9)
    jax.block_until_ready(o)
print(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True), flush=True)
