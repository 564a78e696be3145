"""Gather formulations at post-densification scale.

The backward candidate gather (dpair_rows[pos2]: 16.8M rows x 16 f32)
runs at ~16 GB/s effective and dominates the full-capacity train step
(1.58 s of 2.55 s). [*, 16] f32 arrays are lane-padded 16->128 on TPU,
so every formulation that materializes row-major [N,16] pays 8x; this
probe times the alternatives.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
import jax.numpy as jnp
import numpy as np

M = int(os.environ.get("M", str(8 * 2_097_152)))   # queries (B*P)
S = int(os.environ.get("S", str(8 * 2_228_480)))   # source rows
R = int(os.environ.get("R", "4"))
ITERS = 8

k = jax.random.PRNGKey(0)
# generate ON DEVICE: host->device transfers ride a slow network relay,
# and [S,16] f32 is lane-padded 16->128 on TPU (8x HBM)
idx = jax.block_until_ready(
    jax.random.randint(k, (M,), 0, S, dtype=jnp.int32))
src_t = jax.block_until_ready(
    jax.random.normal(k, (16, S), jnp.float32))
make_rows = jax.jit(lambda t: t.T.copy())



def timeit(label, fn, src, idx):
    # chain iterations with a data dependency: the axon relay memoizes
    # identical dispatches, so independent repeats measure nothing
    def chained(src, idx):
        def step(i, _):
            out = fn(src, i)
            # real data dependency: next indices derive from gathered
            # values (bitcast), so XLA can neither DCE nor hoist
            flat = jnp.ravel(out)
            reps = -(-M // flat.shape[0])
            bits = jax.lax.bitcast_convert_type(
                jnp.tile(flat, reps)[:M], jnp.int32)
            return jnp.abs(bits) % S, None
        i_fin, _ = jax.lax.scan(step, idx, None, length=ITERS)
        return jnp.sum(i_fin)  # scalar: host fetch is the only true sync
        # through the axon relay (block_until_ready returns early)

    f = jax.jit(chained)
    float(f(src, idx))
    # distinct inputs per timed call: the relay memoizes identical calls
    idxs = [jax.block_until_ready((idx + i + 1) % S) for i in range(3)]
    t0 = time.perf_counter()
    for iv in idxs:
        float(f(src, iv))
    dt = (time.perf_counter() - t0) / (ITERS * len(idxs)) * 1e3
    width = 1 if fn is one_d_unit else 16
    gb = M * width * 4 / 1e9
    print(f"{label:34s} {dt:8.2f} ms  ({gb/dt*1e3:6.1f} GB/s payload)",
          flush=True)
    return dt


def rows_gather(src, i):
    return src[i]


def rows_gather_sum(src, i):
    # gather + j-sum fused (the real backward computation)
    return jnp.sum(src[i].reshape(R, M // R, 16), axis=0)


def lane_take(src_t, i):
    return jnp.take(src_t, i, axis=1)  # [16, M]


def per_feature_1d(src_t, i):
    return jnp.stack([src_t[f][i] for f in range(16)])


def per_feature_1d_sum(src_t, i):
    # 16 x 1-D gathers, each immediately j-summed: [16, M/R]
    return jnp.stack([
        jnp.sum(src_t[f][i].reshape(R, M // R), axis=0) for f in range(16)
    ])


def one_d_unit(src_t, i):
    return src_t[0][i]  # single-feature: unit cost of a 1-D f32 gather


VARIANTS = {
    "rows": ("rows [M,16] = src[idx] (current)", rows_gather, "rows"),
    "rows_sum": ("rows + j-sum fused", rows_gather_sum, "rows"),
    "lane": ("lane take axis=1 [16,M]", lane_take, "t"),
    "f16": ("16 x 1-D gathers", per_feature_1d, "t"),
    "f16_sum": ("16 x (1-D gather + j-sum)", per_feature_1d_sum, "t"),
    "unit": ("1 x 1-D gather (unit)", one_d_unit, "t"),
}
which = os.environ.get("V", "unit").split(",")
src_rows = None
for v in which:
    label, fn, kind = VARIANTS[v]
    if kind == "rows":
        if src_rows is None:
            src_rows = jax.block_until_ready(make_rows(src_t))
        timeit(label, fn, src_rows, idx)
    else:
        timeit(label, fn, src_t, idx)
