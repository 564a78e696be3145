"""UNet-forward MFU on the attached chip.

FLOPs come from XLA's own compiled-program cost analysis; time is the
chained steady-state of ITERS forwards inside ONE jitted fori_loop with
a host scalar fetch for sync (round-2 methodology correction: through
the axon relay, block_until_ready can return before the device
finishes, and per-call dispatch adds 10-30 ms relay latency — the
round-3 version of this probe used both, which is why it reported
924 ms for a forward the 759 ms full SDS step demonstrably contains;
see BENCH.md round 4).

Peak: TPU v5e 197 TFLOP/s bf16.
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


@jax.jit
def chain(params, x0):
    def body(i, xc):
        out = fwd(params, xc)
        return x0 + out[..., :8].astype(jnp.float32) * 1e-6
    return jax.lax.fori_loop(0, ITERS, body, x0)


def fetch(o):
    return float(jnp.ravel(o)[0])


fetch(chain(params, x))
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    fetch(chain(params, x))
    best = min(best, (time.perf_counter() - t0) / ITERS)

peak = 197e12
mfu = flops / best / peak
print(
    f"UNet fwd [{B3},64,64,8]: {best*1e3:.1f} ms, "
    f"{flops/1e12:.2f} TFLOP -> {flops/best/1e12:.1f} TFLOP/s "
    f"= {mfu*100:.1f}% MFU (v5e bf16 peak 197)"
)
