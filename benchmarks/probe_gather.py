"""Primitive costs for the bwd-transpose redesign."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


def bench(name, f, *args, iters=20):
    """Vary the FIRST arg per call (+i) — the axon relay memoizes
    identical (executable, inputs) pairs."""
    varied = [(args[0] + i,) + args[1:] for i in range(iters + 1)]
    out = f(*varied[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [f(*varied[1 + i]) for i in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)
    return out


key = jax.random.PRNGKey(0)
for P in (900_000, 1_600_000):
    idx = jax.random.randint(key, (P,), 0, 1025, dtype=jnp.int32)
    table = jnp.arange(1025, dtype=jnp.int32) * 7

    bench(f"small-table gather [P={P}] from [1025] i32",
          jax.jit(lambda i, t: t[jnp.abs(i) % 1025]), idx, table)

    keys = jax.random.randint(key, (P,), 0, 1 << 28, dtype=jnp.int32)
    bench(f"1-op sort P={P}", jax.jit(lambda k: jax.lax.sort(k)), keys)

    pay = jnp.arange(P, dtype=jnp.int32)
    bench(f"2-op sort P={P}",
          jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1)), keys, pay)

    # wide-row gathers at two widths
    tab16 = jax.random.normal(key, (1 << 17, 16))
    ridx = jax.random.randint(key, (P,), 0, 1 << 17, dtype=jnp.int32)
    bench(f"row gather [P={P}] x16 f32", jax.jit(lambda i, t: t[jnp.abs(i) % (1<<17)]),
          ridx, tab16)

# N-sized ops
N = 100_000
ridx = jax.random.randint(key, (N,), 0, 1 << 17, dtype=jnp.int32)
tab16 = jax.random.normal(key, (1 << 17, 16))
bench("row gather [N=100k] x16", jax.jit(lambda i, t: t[jnp.abs(i) % (1<<17)]), ridx, tab16)

