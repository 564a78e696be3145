"""Round-5 probe: operand PACKING for the two big rasterizer sorts.

The glue floor the round-4 verdict challenged is mostly XLA sorts and
gathers. Before building Pallas replacements, measure how much of the
sort cost is per-OPERAND overhead that u64 bit-packing can remove:

  pair sort  (binning):  (tile i32, depth i32 | cand i32, gid i32) nk=2
    vs  (u64 tile<<32|depth | cand, gid)           nk=1  (3 ops)
    vs  (u64 key | u64 cand<<32|gid)               nk=1  (2 ops)
    vs  (u64 key-with-cand-packed)                 nk=1  (1 op)
  routing sort (backward): f32 key + 10 f32 grads  nk=1  (11 ops)
    vs  f32 key + 5 u64-packed grad pairs          nk=1  (6 ops)
    vs  u32 key + 5 u64                            nk=1

Also re-measures the [P,16] row gather at the same sizes for the
gather-vs-sort crossover bookkeeping.
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

ITERS = int(os.environ.get("ITERS", "20"))


def fetch(x):
    return float(jnp.ravel(jax.tree.leaves(x)[0])[0])


def chain(name, fn, x0, n):
    f = jax.jit(lambda x: jax.lax.fori_loop(0, ITERS, lambda i, a: fn(a), x))
    fetch(f(x0))
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        fetch(f(x0))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name} @{n}: {best*1e3:.3f} ms ({best/n*1e9:.2f} ns/elem)",
          flush=True)
    return best


def mix(out, parts):
    for p in parts:
        if p.dtype == jnp.uint64:
            p = (p & 0xFFFFFFFF).astype(jnp.uint32)
        out = out ^ p.astype(jnp.int32).astype(jnp.uint32)
    return jnp.roll(out, 1)


rng = np.random.RandomState(0)
for n in [462_848, 2_097_152]:
    tile = jnp.asarray(rng.randint(0, 1025, size=n).astype(np.int32))
    depth = jnp.asarray(rng.randint(0, 1 << 30, size=n).astype(np.int32))
    cand = jnp.asarray(rng.permutation(n).astype(np.int32))
    gid = jnp.asarray(rng.randint(0, 100_000, size=n).astype(np.int32))
    pay = [jnp.asarray(rng.randn(n).astype(np.float32)) for _ in range(10)]

    def s_cur(t):
        s = jax.lax.sort((t, depth, cand, gid), num_keys=2)
        return mix(s[0].astype(jnp.uint32), s[1:]).astype(jnp.int32)

    def s_u64(t):
        k = (t.astype(jnp.uint64) << 32) | depth.astype(jnp.uint32).astype(jnp.uint64)
        s = jax.lax.sort((k, cand, gid), num_keys=1)
        return mix(t.astype(jnp.uint32), s).astype(jnp.int32)

    def s_u64p(t):
        k = (t.astype(jnp.uint64) << 32) | depth.astype(jnp.uint32).astype(jnp.uint64)
        p = (cand.astype(jnp.uint64) << 32) | gid.astype(jnp.uint32).astype(jnp.uint64)
        s = jax.lax.sort((k, p), num_keys=1)
        return mix(t.astype(jnp.uint32), s).astype(jnp.int32)

    def s_u64one(t):
        # [tile:12][depthrank:20][cand-ish:22] all packed in one u64
        k = ((t.astype(jnp.uint64) << 42)
             | (gid.astype(jnp.uint64) << 22)
             | cand.astype(jnp.uint64))
        s = jax.lax.sort((k,), num_keys=1)
        return mix(t.astype(jnp.uint32), s).astype(jnp.int32)

    chain("pair cur 4op nk2", s_cur, tile, n)
    chain("pair u64 3op nk1", s_u64, tile, n)
    chain("pair u64 2op nk1", s_u64p, tile, n)
    chain("pair u64 1op nk1", s_u64one, tile, n)

    def r_cur(k):
        s = jax.lax.sort((k,) + tuple(pay), num_keys=1)
        return jax.lax.bitcast_convert_type(mix(k.astype(jnp.uint32), s[1:]), jnp.float32)

    def r_pack(k):
        packed = [
            (jax.lax.bitcast_convert_type(pay[2 * i], jnp.uint32)
             .astype(jnp.uint64) << 32)
            | jax.lax.bitcast_convert_type(pay[2 * i + 1], jnp.uint32)
            .astype(jnp.uint64)
            for i in range(5)
        ]
        s = jax.lax.sort((k,) + tuple(packed), num_keys=1)
        return jax.lax.bitcast_convert_type(mix(k.astype(jnp.uint32), s[1:]), jnp.float32)

    kf = jnp.asarray(rng.rand(n).astype(np.float32))
    chain("route f32k+10f32", r_cur, kf, n)
    chain("route f32k+5u64", r_pack, kf, n)

    # row gather reference: [P,16] rows by n indices
    src = jnp.asarray(rng.randn(n, 16).astype(np.float32))
    idx0 = jnp.asarray(rng.randint(0, n, size=n).astype(np.int32))

    def g_row(i):
        r = src[i]
        return jnp.roll(i ^ r[:, 0].astype(jnp.int32), 1)

    chain("row gather [n,16]", g_row, idx0, n)
