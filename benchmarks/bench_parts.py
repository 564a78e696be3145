"""Stage breakdown of the SDS step on TPU: UNet fwd, VAE encode, render."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.guidance.unet import DualBranchUNet, SD2_BASE_CONFIG
from humangaussian_tpu.guidance.vae import AutoencoderKL, VAEConfig

def timeit(name, fn, *args, iters=3):
    out = fn(*args); jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter(); out = fn(*args); jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {np.median(ts)*1e3:.1f} ms", flush=True)

rng = jax.random.PRNGKey(0)
unet = DualBranchUNet(SD2_BASE_CONFIG)
x1 = jnp.zeros((1, 64, 64, 8))
up = jax.jit(unet.init)(rng, x1, x1, jnp.zeros((1,)), jnp.zeros((1, 77, 1024)), jnp.zeros((1, 6)))
print("unet ready", flush=True)

B3 = 24
xb = jax.random.normal(rng, (B3, 64, 64, 8))
ctx = jax.random.normal(rng, (B3, 77, 1024))
t = jnp.full((B3,), 500.0)
tids = jnp.ones((B3, 6))

@jax.jit
def unet_fwd(p, xb):
    return unet.apply(p, xb, xb, t, ctx, tids)
timeit("unet fwd 24x64^2", unet_fwd, up, xb)

vae = AutoencoderKL(VAEConfig())
vp = jax.jit(vae.init)(rng, jnp.zeros((1, 512, 512, 3)), rng)
img8 = jax.random.normal(rng, (8, 512, 512, 3))

@jax.jit
def vae_enc(p, img):
    m, lv = vae.apply(p, img, method=vae.encode)
    return m
timeit("vae encode 8x512^2", vae_enc, vp, img8)

@jax.jit
def vae_enc_bwd(p, img):
    def f(i):
        m, _ = vae.apply(p, i, method=vae.encode)
        return jnp.sum(m ** 2)
    return jax.grad(f)(img)
timeit("vae encode fwd+bwd 8x512^2", vae_enc_bwd, vp, img8)
