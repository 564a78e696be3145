"""A/B: flax nn.GroupNorm (+silu) vs ops.groupnorm fused kernel at SDS
training shapes. Run on the TPU chip; prints per-shape ms for forward
and (where grads flow in training: VAE encode) forward+backward."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.ops.groupnorm import group_norm_act

# (label, shape NHWC, groups, needs_grad)
CASES = [
    ("unet64_320", (24, 64, 64, 320), 32, False),
    ("unet32_640", (24, 32, 32, 640), 32, False),
    ("unet16_1280", (24, 16, 16, 1280), 32, False),
    ("vae512_128", (8, 512, 512, 128), 32, True),
    ("vae256_256", (8, 256, 256, 256), 32, True),
    ("vae128_512", (8, 128, 128, 512), 32, True),
]
ITERS = 30


def chain(fn, x, iters):
    """Data-dependent chain so the axon relay can't memoize dispatches."""
    def step(h, _):
        return fn(h), None
    out, _ = jax.lax.scan(step, x, None, length=iters)
    return jnp.sum(out.astype(jnp.float32))


def timeit(fn, x):
    f = jax.jit(lambda x: chain(fn, x, ITERS))
    float(f(x))  # compile; host fetch = only true sync via the relay
    best = float("inf")
    for t in range(2):
        x2 = x + jnp.bfloat16(1e-3 * (t + 1))
        t0 = time.perf_counter()
        float(f(x2))
        best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
    return best


def main():
    for label, shape, groups, needs_grad in CASES:
        c = shape[-1]
        # generate ON DEVICE: big host->device transfers crawl through
        # the relay tunnel
        x = jax.block_until_ready(
            jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16))
        scale = jnp.ones((c,), jnp.bfloat16)
        bias = jnp.zeros((c,), jnp.bfloat16)

        def flax_fn(h):
            y = nn.GroupNorm(num_groups=groups, epsilon=1e-6,
                             dtype=jnp.bfloat16).apply(
                {"params": {"scale": scale, "bias": bias}}, h)
            return nn.silu(y)

        def fused_fn(h):
            return group_norm_act(h, scale, bias, groups, 1e-6, True)

        t_flax = timeit(flax_fn, x)
        t_fused = timeit(fused_fn, x)
        line = f"{label:14s} fwd: flax {t_flax:7.3f} ms  fused {t_fused:7.3f} ms  ({t_flax/t_fused:4.2f}x)"
        if needs_grad:
            def g_flax(h):
                return jax.grad(
                    lambda h: jnp.sum(flax_fn(h).astype(jnp.float32))
                )(h)

            def g_fused(h):
                return jax.grad(
                    lambda h: jnp.sum(fused_fn(h).astype(jnp.float32))
                )(h)

            tg_flax = timeit(g_flax, x)
            tg_fused = timeit(g_fused, x)
            line += f" | grad: flax {tg_flax:7.3f} fused {tg_fused:7.3f} ({tg_flax/tg_fused:4.2f}x)"
        # bandwidth speed-of-light: fwd = 2 reads + 1 write of bf16
        nbytes = int(np.prod(shape)) * 2
        sol = 3 * nbytes / 819e9 * 1e3
        line += f"  [sol~{sol:5.2f} ms]"
        print(line, flush=True)


if __name__ == "__main__":
    main()
