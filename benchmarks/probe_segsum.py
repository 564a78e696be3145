"""Probe: backward return-path candidates (round 3).

The rasterizer VJP must route per-PAIR gradient rows (16-wide) back to
per-GAUSSIAN rows, summing the <= r pairs of each Gaussian. Today this
runs as pos2 carry-back sorts (sorted->candidate order) + j-major
gather/reduce. Candidate replacement: everything stays in SORTED pair
order (rank recovered elementwise from the sorted key) and a
segment-sum / scatter-add keyed by rank does the reduction.

Measured here (chained inside one jit, 20 iters):
  A. segment_sum of [P,16] f32 rows by rank into [N,16]
  B. same via sort-by-rank + blocked reduce (sort-based fallback)
  C. row gather [P,16] from page rows (src >= idx fast path)
  D. 1-op vs 2-op sort at P (confirm payload-free assumption)
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

ITERS = int(os.environ.get("ITERS", "20"))


def chain(name, fn, x0, per=None):
    f = jax.jit(lambda x: jax.lax.fori_loop(0, ITERS, lambda i, a: fn(a), x))
    out = f(x0); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = f(x0); jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    extra = f"  ({dt/per*1e9:.2f} ns/elem)" if per else ""
    print(f"{name}: {dt*1e3:.3f} ms{extra}", flush=True)
    return dt


rng = np.random.RandomState(0)
N = 131072  # n_cap-ish
for P in (393216, 917504):
    ranks = jnp.asarray(rng.randint(0, N, size=P).astype(np.int32))
    rows = jnp.asarray(rng.randn(P, 16).astype(np.float32))
    src = jnp.asarray(rng.randn(P + 131072, 16).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, P + 131072, size=P).astype(np.int32))

    # A: segment_sum by rank
    def segsum(x):
        out = jax.ops.segment_sum(rows + x[0, 0], ranks, num_segments=N)
        return out[:1, :1] + x * 0
    chain(f"A segment_sum [{P},16] -> [{N},16]", segsum,
          jnp.zeros((1, 1), jnp.float32), per=P)

    # A2: segment_sum 1-wide (16 separate?) - just 1 col to compare width
    col = rows[:, 0]
    def segsum1(x):
        out = jax.ops.segment_sum(col + x[0, 0], ranks, num_segments=N)
        return out[:1, None] + x * 0
    chain(f"A2 segment_sum [{P}] 1-wide", segsum1,
          jnp.zeros((1, 1), jnp.float32), per=P)

    # C: row gather fast path
    def gath(x):
        out = src[idx + jnp.int32(x[0, 0])]
        return out[:1, :1] * 1e-9 + x
    chain(f"C row gather [{P}] from [{P+131072},16]", gath,
          jnp.zeros((1, 1), jnp.float32), per=P)

    # D: sorts
    keys = jnp.asarray(rng.randint(0, 2**31, size=P).astype(np.uint32))
    pay = jnp.asarray(rng.randint(0, 2**31, size=P).astype(np.int32))
    def s1(x):
        out = jax.lax.sort(keys ^ jnp.uint32(x[0, 0]))
        return x + out[:1, None].astype(jnp.float32) * 1e-9
    chain(f"D sort 1-op [{P}]", s1, jnp.zeros((1, 1), jnp.float32), per=P)
    def s2(x):
        k, v = jax.lax.sort((keys ^ jnp.uint32(x[0, 0]), pay), num_keys=1)
        return x + (k[:1, None].astype(jnp.float32)
                    + v[:1, None].astype(jnp.float32)) * 1e-9
    chain(f"D sort 2-op [{P}]", s2, jnp.zeros((1, 1), jnp.float32), per=P)
