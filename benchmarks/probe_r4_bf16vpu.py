"""Micro-probe: VPU elementwise throughput f32 vs bf16 in Pallas.

Decides whether a bf16 'panel math' fast mode can ever pay on v5e: if
bf16 elementwise ops run at 2x f32 (packed (16,128) registers), panel
math in bf16 halves the compositing kernels' VPU time; if they run at
1x, bf16 only saves memory and the fast mode is pointless.
"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, COLS = 1024, 128
REPS = 200  # inner op-chain length


def kernel(x_ref, o_ref, *, ops):
    a = x_ref[:]
    b = a * 1.0001
    for i in range(REPS):
        if ops == "mad":
            b = b * a + a
        elif ops == "exp":
            b = jnp.exp(-jnp.abs(b) * 1e-3) + a
        elif ops == "cmpsel":
            b = jnp.where(b > a, b * 0.999, b + a)
    o_ref[:] = b


def run(dtype, ops):
    x = jnp.ones((ROWS, COLS), dtype) * 0.5
    f = pl.pallas_call(
        functools.partial(kernel, ops=ops),
        out_shape=jax.ShapeDtypeStruct((ROWS, COLS), dtype),
    )
    g = jax.jit(lambda v: jax.lax.fori_loop(
        0, 50, lambda i, a: f(a) * 0.999, v))
    r = g(x)
    float(jnp.ravel(r)[0])
    t0 = time.perf_counter()
    r = g(x)
    float(jnp.ravel(r)[0])
    dt = (time.perf_counter() - t0) / 50
    nops = ROWS * COLS * REPS * (2 if ops == "mad" else 2)
    print(f"{dtype.__name__:9s} {ops:7s}: {dt*1e6:8.1f} us/call "
          f"({nops/dt/1e12:.2f} Tops/s equiv)", flush=True)
    return dt


for ops in ["mad", "cmpsel", "exp"]:
    t_f32 = run(jnp.float32, ops)
    t_bf16 = run(jnp.bfloat16, ops)
    print(f"  -> bf16 speedup for {ops}: {t_f32 / t_bf16:.2f}x", flush=True)
