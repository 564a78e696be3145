"""XLA TPU sort cost vs operand count and size (u32 key + f32 payloads).

The round-3 lore ("a 17-op sort is 1.27x a 1-op sort at 2M") drove the
round-4 feature-payload design; this probe re-measures the actual curve
at the sizes the rasterizer pays (400k-2.5M) so the design can be chosen
on numbers.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

ITERS = int(os.environ.get("ITERS", "20"))


def fetch(x):
    return float(jnp.ravel(jax.tree.leaves(x)[0])[0])


def chain(name, fn, x0):
    f = jax.jit(lambda x: jax.lax.fori_loop(0, ITERS, lambda i, a: fn(a), x))
    fetch(f(x0))
    best = np.inf
    for t in range(2):
        t0 = time.perf_counter()
        fetch(f(x0))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name}: {best*1e3:.3f} ms ({best/float(name.split('@')[1])*1e9:.2f} ns/elem)",
          flush=True)
    return best


rng = np.random.RandomState(0)
for n in [393216, 917504, 2097152]:
    keys0 = jnp.asarray(rng.randint(0, 1 << 30, size=n).astype(np.uint32))
    pay = [jnp.asarray(rng.randn(n).astype(np.float32)) for _ in range(16)]

    def mk(nops):
        def f(k):
            ops = (k,) + tuple(pay[:nops])
            s = jax.lax.sort(ops, num_keys=1)
            # fold result back into the carried key so the chain has a
            # data dependency and nothing is DCE'd
            out = s[0]
            for p in s[1:]:
                out = out ^ p.astype(jnp.int32).astype(jnp.uint32)
            return jnp.roll(out, 1)
        return f

    for nops in [0, 1, 4, 10, 16]:
        chain(f"sort+{nops}pay @{n}", mk(nops), keys0)
