"""Careful timing: varied inputs per call, donate, explicit chain to defeat caching."""
import time
import jax
import jax.numpy as jnp


def bench(f, make_args, n=20, warmup=3):
    args = [make_args(i) for i in range(n + warmup)]
    for i in range(warmup):
        jax.block_until_ready(f(*args[i]))
    t0 = time.perf_counter()
    outs = []
    for i in range(warmup, warmup + n):
        outs.append(f(*args[i]))
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n * 1e3


key = jax.random.PRNGKey(0)

# matmul with varied inputs
a0 = jax.random.normal(key, (4096, 4096))
f = jax.jit(lambda a: a @ a)
ms = bench(f, lambda i: (a0 + i,))
print(f"matmul 4096^3 f32 varied: {ms:.3f} ms = {2*4096**3/ms/1e9:.0f} GF/s")

b0 = a0.astype(jnp.bfloat16)
ms = bench(f, lambda i: (b0 + i,))
print(f"matmul 4096^3 bf16 varied: {ms:.3f} ms = {2*4096**3/ms/1e9:.0f} GF/s")

# chained matmul (8 in sequence) to amortize dispatch
f8 = jax.jit(lambda a: jax.lax.fori_loop(0, 8, lambda i, x: x @ x * 1e-3, a))
ms = bench(f8, lambda i: (b0 + i,))
print(f"matmul-chain8 bf16: {ms/8:.3f} ms each = {2*4096**3/(ms/8)/1e9:.0f} GF/s")

# kv sort varied
P = 1 << 22
k0 = jax.random.randint(key, (P,), 0, 1 << 27, dtype=jnp.int32)
v0 = jnp.arange(P, dtype=jnp.int32)
fs = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
ms = bench(fs, lambda i: (k0 + i, v0))
print(f"kv-sort P={P} varied: {ms:.3f} ms")

P = 1 << 21
k1 = jax.random.randint(key, (P,), 0, 1 << 27, dtype=jnp.int32)
ms = bench(fs, lambda i: (k1 + i, v0[:P]))
print(f"kv-sort P={P} varied: {ms:.3f} ms")

# argsort N varied
N = 1 << 19
x0 = jax.random.uniform(key, (N,))
fa = jax.jit(jnp.argsort)
ms = bench(fa, lambda i: (x0 + i * 1e-6,))
print(f"argsort N={N} varied: {ms:.3f} ms")
N = 1 << 17
ms = bench(fa, lambda i: (x0[:N] + i * 1e-6,))
print(f"argsort N={N} varied: {ms:.3f} ms")

# segment_sum varied
P, N = 1 << 21, 1 << 17
seg = jax.random.randint(key, (P,), 0, N, dtype=jnp.int32)
vals = jax.random.normal(key, (P, 8))
fseg = jax.jit(lambda v, s: jax.ops.segment_sum(v, s, num_segments=N))
ms = bench(fseg, lambda i: (vals + i, seg))
print(f"segment_sum P={P}->N={N} x8: {ms:.3f} ms")

# gather varied
tab = jax.random.normal(key, (N, 16))
idx = jax.random.randint(key, (P,), 0, N, dtype=jnp.int32)
fg = jax.jit(lambda t, i: t[i])
ms = bench(fg, lambda i: (tab + i, idx))
print(f"gather P={P} x16: {ms:.3f} ms")

# exp throughput varied
x = jax.random.normal(key, (4096, 4096))
fe = jax.jit(lambda x: jnp.exp(x))
ms = bench(fe, lambda i: (x + i * 1e-3,))
print(f"exp 16.7M varied: {ms:.3f} ms = {16.7e6/ms/1e6:.1f} Gexp/s")

# elementwise fused chain ~ compositing step cost model:
# per element: exp + log1p + 6 mul/add on (4096,4096)
fc = jax.jit(lambda x: jnp.log1p(-jnp.clip(0.9 * jnp.exp(-0.5 * x * x) , 0, 0.99)) * x + x * 0.5)
ms = bench(fc, lambda i: (x + i * 1e-3,))
print(f"composite-ish elementwise 16.7M: {ms:.3f} ms")

# dispatch overhead: trivial op
ft = jax.jit(lambda x: x + 1.0)
s = jnp.zeros((8, 128))
ms = bench(ft, lambda i: (s + i,), n=50)
print(f"tiny dispatch: {ms:.3f} ms")
