"""UNet-forward MFU on the attached chip (VERDICT r2 weak #4: the
guidance side had ms anatomy but no denominator).

FLOPs come from XLA's own compiled-program cost analysis; time is the
chained steady-state of the jitted forward at the training shape
(3 CFG segments x batch 8 = 24 latents, 64^2 x 8ch, bf16 weights).
Peak: TPU v5e 197 TFLOP/s bf16 (394 with int8 — not used).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from humangaussian_tpu.guidance.unet import DualBranchUNet, SD2_BASE_CONFIG

ITERS = int(os.environ.get("ITERS", "10"))
B3 = int(os.environ.get("B3", "24"))  # 3 CFG segments x batch 8

rng = jax.random.PRNGKey(0)
unet = DualBranchUNet(SD2_BASE_CONFIG)
x1 = jnp.zeros((1, 64, 64, 8))
params = jax.jit(unet.init)(
    rng, x1, x1, jnp.zeros((1,)), jnp.zeros((1, 77, 1024)), jnp.zeros((1, 6))
)
params = jax.tree.map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
)

x = jax.random.normal(rng, (B3, 64, 64, 8), jnp.float32)
t = jnp.full((B3,), 500.0)
ctx = jax.random.normal(rng, (B3, 77, 1024), jnp.float32)
tid = jnp.tile(jnp.array([[1024.0, 1024, 0, 0, 1024, 1024]]), (B3, 1))


def fwd(params, x):
    return unet.apply(params, x, x, t, ctx, tid)


jitted = jax.jit(fwd)
lowered = jitted.lower(params, x)
compiled = lowered.compile()
ca = compiled.cost_analysis()
ca = ca[0] if isinstance(ca, (list, tuple)) else ca
flops = float(ca.get("flops", float("nan")))

out = jitted(params, x)
jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(ITERS):
    out = jitted(params, jnp.abs(out[..., :8]) * 1e-6 + x)  # chained
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / ITERS

peak = 197e12
mfu = flops / dt / peak
print(
    f"UNet fwd [{B3},64,64,8]: {dt*1e3:.1f} ms, "
    f"{flops/1e12:.2f} TFLOP -> {flops/dt/1e12:.1f} TFLOP/s "
    f"= {mfu*100:.1f}% MFU (v5e bf16 peak 197)"
)
