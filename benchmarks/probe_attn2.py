"""Device-time comparison: stock flash vs custom pallas attention.

Timing via XPlane trace (relay wall-times are unreliable)."""
import os, sys, glob, math
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from humangaussian_tpu.ops.attention import self_attention

B, H, S, D = 24, 5, 4096, 64
rng = jax.random.PRNGKey(0)
q = jax.random.normal(rng, (B, S, H, D), jnp.bfloat16)
k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D), jnp.bfloat16)
sm = 1.0 / math.sqrt(D)

from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

@jax.jit
def stock(q, k, v):
    t = lambda x: x.transpose(0, 2, 1, 3)
    return t(flash_attention(t(q), t(k), t(v), sm_scale=sm))

@jax.jit
def mine(q, k, v):
    return self_attention(q, k, v, sm)

o1 = stock(q, k, v); o2 = mine(q, k, v)
jax.block_until_ready((o1, o2))
err = jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32)))
print("max abs diff vs stock flash:", float(err), flush=True)

logdir = "/tmp/attn_trace"; os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    for _ in range(3):
        o1 = stock(q, k, v)
        o2 = mine(q, k, v)
    jax.block_until_ready((o1, o2))
print(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True), flush=True)
