"""Round-3 kernel probes: the measurements that pick the rasterizer design.

A: in-kernel lane gather (take_along_axis / dynamic_gather) support +
   throughput at various source extents. If fast at extent >= 64k, the
   pair-build XLA gather (9 ns/index serialized) can move into the
   composite kernel.
B: transcendental (exp / log1p) throughput on [1024,128] panels vs
   plain mul-add, to size the compositing math budget.
C: MXU monomial matmuls: [PIX,6]x[6,G] power build and the [PIX,G]x[G,G]
   triangular cumsum, f32.
D: XLA gather baseline at bench sizes (for comparison).
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def fetch(x):
    return float(jnp.ravel(jax.tree.leaves(x)[0])[0])


def timeit(name, fn, *args, iters=20):
    try:
        out = fn(*args)
        fetch(out)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return None
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fetch(fn(*args))
        ts.append((time.perf_counter() - t0) / iters)
    dt = min(ts)
    print(f"{name}: {dt*1e3:.3f} ms", flush=True)
    return dt


# ---------------------------------------------------------------- A: gather
def gather_kernel(idx_ref, src_ref, out_ref, *, iters):
    def body(i, acc):
        idx = (idx_ref[:] + i) % src_ref.shape[1]
        g = jnp.take_along_axis(
            src_ref[:], jnp.broadcast_to(idx, (src_ref.shape[0], idx.shape[1])), axis=1
        )
        return acc + g

    out_ref[:] = jax.lax.fori_loop(
        0, iters, body, jnp.zeros_like(out_ref)
    )


def probe_gather(extent, nf=16, width=128, iters=100):
    src = jnp.arange(nf * extent, dtype=jnp.float32).reshape(nf, extent)
    idx = (jnp.arange(width, dtype=jnp.int32) * 7919) % extent

    @jax.jit
    def run(src, idx):
        return pl.pallas_call(
            functools.partial(gather_kernel, iters=iters),
            out_shape=jax.ShapeDtypeStruct((nf, width), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx.reshape(1, width), src)

    dt = timeit(f"A in-kernel gather [{nf},{extent}] x {width} idx x{iters}",
                run, src, idx, iters=iters)
    if dt is not None:
        print(f"   -> {dt / width * 1e9:.2f} ns/index")


# ------------------------------------------------- B: transcendental panels
def trans_kernel(x_ref, out_ref, *, iters, op):
    def body(i, acc):
        v = x_ref[:] * (1.0 + i * 1e-9)
        if op == "exp":
            return acc + jnp.exp(v)
        if op == "log1p":
            return acc + jnp.log1p(-0.5 * jnp.abs(v))
        return acc + v * 1.000001 + 0.5

    out_ref[:] = jax.lax.fori_loop(0, iters, body, jnp.zeros_like(out_ref))


def probe_trans(op, pix=1024, g=128, iters=200):
    x = jnp.ones((pix, g), jnp.float32) * 0.1

    @jax.jit
    def run(x):
        return pl.pallas_call(
            functools.partial(trans_kernel, iters=iters, op=op),
            out_shape=jax.ShapeDtypeStruct((pix, g), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    dt = timeit(f"B {op} [{pix},{g}] x{iters}", run, x, iters=iters)
    if dt is not None:
        print(f"   -> {pix*g/dt*1e-9:.1f} Gelem/s")


# ------------------------------------------------------------ C: MXU shapes
def mm_kernel(a_ref, b_ref, out_ref, *, iters):
    def body(i, acc):
        return acc + jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out_ref[:] = jax.lax.fori_loop(0, iters, body, jnp.zeros_like(out_ref))


def probe_mm(m, k, n, iters=200):
    a = jnp.ones((m, k), jnp.float32)
    b = jnp.ones((k, n), jnp.float32)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            functools.partial(mm_kernel, iters=iters),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)

    dt = timeit(f"C mm f32 [{m},{k}]x[{k},{n}] x{iters}", run, a, b, iters=iters)
    if dt is not None:
        print(f"   -> {2*m*k*n/dt*1e-12:.2f} TFLOP/s")


# ----------------------------------------------------- D: XLA gather baseline
def probe_xla_gather(n_src, n_idx, width=16):
    src = jnp.arange(n_src * width, dtype=jnp.float32).reshape(n_src, width)
    idx = (jnp.arange(n_idx, dtype=jnp.int32) * 7919) % n_src

    @jax.jit
    def run(src, idx):
        def body(i, acc):
            return acc + jnp.sum(src[(idx + i) % n_src], axis=0)

        return jax.lax.fori_loop(0, 10, body, jnp.zeros((width,), jnp.float32))

    dt = timeit(f"D XLA row gather [{n_src},{width}] x {n_idx} idx x10",
                run, src, idx, iters=10)
    if dt is not None:
        print(f"   -> {dt / n_idx * 1e9:.2f} ns/index")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "a"):
        for ext in (128, 1024, 8192, 65536):
            probe_gather(ext)
    if which in ("all", "b"):
        probe_trans("mul")
        probe_trans("exp")
        probe_trans("log1p")
    if which in ("all", "c"):
        probe_mm(1024, 8, 128)
        probe_mm(1024, 128, 128)
        probe_mm(8, 128, 1024)
        probe_mm(1024, 16, 128)
    if which in ("all", "d"):
        probe_xla_gather(100_000, 392_704)
        probe_xla_gather(100_000, 900_000)
