"""Round-5 probe: Pallas per-row DMA gather rate vs XLA's gather.

The round-4 verdict's last unexplored axis: the rasterizer's glue pays
XLA's index-serialized gather (~4.5-23 ns/idx) and multi-operand sorts;
could a hand-rolled Pallas kernel route rows with computed DMA instead?
This measures the raw primitive that any such kernel is built from: a
windowed stream of small async copies (one per gathered row) from HBM,
W outstanding at a time.

MEASURED CONSTRAINT (round 5): Mosaic REJECTS HBM slices narrower
than the 128-lane tiling ("Slice shape along dimension 1 must be
aligned to tiling (128)") — a [16]-f32 (64 B) pair-feature row cannot
be DMA'd individually at all. The minimum per-row DMA is 512 B, an 8x
byte amplification over the 64 B payload, so this probe measures the
512 B-row case that IS expressible; the per-64B-row effective cost is
at least that number. Random and sorted index streams expose locality
sensitivity. If the measured ns/row is not clearly below XLA's ns/idx
at the same size, the DMA-routing kernel idea is dead and the
sort/gather glue stands as the hardware floor.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = int(os.environ.get("ITERS", "5"))
W = int(os.environ.get("W", "16"))  # outstanding DMAs


def gather_kernel(idx_ref, src_hbm, out_hbm, sem, *, r):
    def get(i):
        return pltpu.make_async_copy(
            src_hbm.at[idx_ref[i]], out_hbm.at[i], sem.at[jax.lax.rem(i, W)]
        )

    for i in range(W):
        get(jnp.int32(i)).start()

    def body(i, _):
        get(i).wait()

        @pl.when(i + W < r)
        def _():
            get(i + W).start()

        return 0

    jax.lax.fori_loop(0, r, body, 0)


def dma_gather(src, idx, width):
    r = idx.shape[0]
    return pl.pallas_call(
        functools.partial(gather_kernel, r=r),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((W,))],
        ),
        out_shape=jax.ShapeDtypeStruct((r, width), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, src)


def fetch(x):
    return float(jnp.ravel(x)[0])


def bench(name, f, *args):
    n = args[1].shape[0]
    g = jax.jit(f)
    fetch(g(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        fetch(g(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name} @{n}: {best*1e3:.3f} ms ({best/n*1e9:.2f} ns/row)",
          flush=True)


rng = np.random.RandomState(0)
for r in [131_072]:  # idx rides SMEM scalar-prefetch (1 MB cap)
    n = r
    idx_rand = jnp.asarray(rng.randint(0, n, size=r).astype(np.int32))
    idx_sort = jnp.sort(idx_rand)
    for width in [128]:
        src = jnp.asarray(rng.randn(n, width).astype(np.float32))
        bench(f"pallas dma w{width} rand",
              lambda s, i: dma_gather(s, i, width), src, idx_rand)
        bench(f"pallas dma w{width} sorted",
              lambda s, i: dma_gather(s, i, width), src, idx_sort)
        bench(f"xla gather w{width} rand", lambda s, i: s[i], src, idx_rand)
        bench(f"xla gather w{width} sorted", lambda s, i: s[i], src, idx_sort)
