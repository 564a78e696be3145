"""Empirical probes of TPU primitive performance on the target chip.

Decides the rasterizer strategy: is jax.lax.sort / segment_sum / scatter /
cumsum fast enough for CUDA-style duplicate+sort tile binning, and does
Pallas/Mosaic compile on this platform at all?

Run: python benchmarks/probe_tpu.py
"""
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)

    # 1) sort N f32 (depth argsort)
    for N in (1 << 17, 1 << 19):
        x = jax.random.uniform(key, (N,))
        f = jax.jit(lambda x: jnp.argsort(x))
        print(f"argsort f32 N={N}: {timeit(f, x):.3f} ms")

    # 2) key-value sort of P pairs (tile binning, CUDA-style)
    for P in (1 << 21, 1 << 22):
        k = jax.random.randint(key, (P,), 0, 1 << 27, dtype=jnp.int32)
        v = jnp.arange(P, dtype=jnp.int32)
        f = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
        print(f"kv-sort int32 P={P}: {timeit(f, k, v):.3f} ms")

    # 3) segment_sum P -> N (backward grad accumulation)
    for P, N in ((1 << 21, 1 << 17),):
        seg = jax.random.randint(key, (P,), 0, N, dtype=jnp.int32)
        vals = jax.random.normal(key, (P, 8))
        f = jax.jit(functools.partial(jax.ops.segment_sum, num_segments=N))
        print(f"segment_sum P={P}->N={N} x8ch: {timeit(f, vals, seg):.3f} ms")

    # 4) scatter into flat list (binning placement)
    for P in (1 << 21,):
        idx = jax.random.randint(key, (P,), 0, P, dtype=jnp.int32)
        vals = jnp.arange(P, dtype=jnp.int32)
        f = jax.jit(lambda i, v: jnp.zeros((P,), jnp.int32).at[i].set(v))
        print(f"scatter-set P={P}: {timeit(f, idx, vals):.3f} ms")

    # 5) gather P rows of 16 floats (list -> features)
    for P, N in ((1 << 21, 1 << 19),):
        idx = jax.random.randint(key, (P,), 0, N, dtype=jnp.int32)
        tab = jax.random.normal(key, (N, 16))
        f = jax.jit(lambda t, i: t[i])
        print(f"gather P={P} x16ch: {timeit(f, tab, idx):.3f} ms")

    # 6) cumsum over [N, 256] axis 0 (counting)
    x = jax.random.uniform(key, (1 << 17, 256))
    f = jax.jit(lambda x: jnp.cumsum(x, axis=0))
    print(f"cumsum [131072,256]: {timeit(f, x):.3f} ms")

    # 7) big exp throughput (compositing inner loop)
    x = jax.random.normal(key, (4096, 4096))
    f = jax.jit(lambda x: jnp.exp(x).sum())
    print(f"exp 16.7M: {timeit(f, x):.3f} ms")

    # 8) f32 matmul (MXU check)
    a = jax.random.normal(key, (4096, 4096))
    f = jax.jit(lambda a: a @ a)
    ms = timeit(f, a)
    print(f"matmul 4096^3 f32: {ms:.3f} ms = {2*4096**3/ms/1e9:.1f} GF/s")
    ab = a.astype(jnp.bfloat16)
    f = jax.jit(lambda a: (a @ a))
    ms = timeit(f, ab)
    print(f"matmul 4096^3 bf16: {ms:.3f} ms = {2*4096**3/ms/1e9:.1f} GF/s")

    # 9) Pallas smoke test
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kern(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 2.0 + jnp.exp(x_ref[:])

        x = jax.random.normal(key, (256, 256))
        f = jax.jit(
            lambda x: pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)
        )
        r = f(x)
        np.testing.assert_allclose(r, x * 2 + np.exp(x), rtol=1e-5)
        print(f"pallas smoke: OK {timeit(f, x):.3f} ms")
    except Exception as e:  # noqa: BLE001
        print(f"pallas smoke: FAILED -> {type(e).__name__}: {e}")

    # 10) pallas with grid + scratch + fori accumulation (closer to rasterizer)
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kern(x_ref, o_ref):
            def body(i, acc):
                return acc + jnp.exp(x_ref[pl.ds(i * 128, 128), :])
            acc = jax.lax.fori_loop(0, 8, body, jnp.zeros((128, 128), jnp.float32))
            o_ref[:] = acc

        x = jax.random.normal(key, (1024, 128))
        f = jax.jit(
            lambda x: pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((128, 128), x.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)
        )
        r = f(x)
        np.testing.assert_allclose(
            r, np.exp(np.asarray(x)).reshape(8, 128, 128).sum(0), rtol=1e-4
        )
        print(f"pallas fori/ds: OK {timeit(f, x):.3f} ms")
    except Exception as e:  # noqa: BLE001
        print(f"pallas fori/ds: FAILED -> {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
