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

# ---- step bisection: render-only vs guidance-only --------------------
from humangaussian_tpu.testing import tiny_system  # noqa: E402
from humangaussian_tpu.data.cameras import RandomCameraConfig  # noqa: E402
from humangaussian_tpu.guidance.dual_branch import DualBranchGuidance, GuidanceConfig  # noqa: E402
from humangaussian_tpu.guidance.schedule import DiffusionSchedule  # noqa: E402
from humangaussian_tpu.ops.projection import RasterizeConfig  # noqa: E402
from humangaussian_tpu.smplx.model import toy_model  # noqa: E402
from humangaussian_tpu.smplx.skeleton import Skeleton  # noqa: E402
from humangaussian_tpu.train.system import GaussianDreamerConfig, GaussianDreamerSystem  # noqa: E402
from humangaussian_tpu.guidance.prompt import PromptEmbeddings  # noqa: E402

guidance = DualBranchGuidance(
    unet=unet, unet_params=up, vae=vae, vae_params=vp,
    schedule=DiffusionSchedule.create(),
    cfg=GuidanceConfig(latent_size=64, image_size=512),
)
emb = PromptEmbeddings(
    text_vd=jax.random.normal(rng, (4, 77, 1024)),
    uncond_vd=jax.random.normal(rng, (4, 77, 1024)),
    text=jnp.zeros((77, 1024)), uncond=jnp.zeros((77, 1024)),
    null=jnp.zeros((77, 1024)),
)
skel = Skeleton(style="humansd", apose=True).load_smplx(toy_model()).scale(-10)
system = GaussianDreamerSystem(
    GaussianDreamerConfig(capacity=1 << 17, pts_num=65536),
    skel, guidance, emb,
    camera_cfg=RandomCameraConfig(batch_size=8, height=1024, width=1024),
    raster_cfg=RasterizeConfig(tile=32, max_tiles_per_gaussian=16),
)
state = system.init_state(rng)

# full guidance __call__ fwd+bwd on synthetic renders (isolates guidance)
@jax.jit
def guidance_only(g, imgs):
    def loss(im):
        out = g(imgs, im, imgs, jax.random.normal(rng, (24, 77, 1024)),
                jnp.full((8,), 500, jnp.int32), rng)
        return out["loss_sds"]
    return jax.grad(loss)(imgs)

imgs = jax.random.uniform(rng, (8, 1024, 1024, 3))
timeit("guidance fwd+bwd (8x1024^2 in)", guidance_only, guidance, imgs)

# render-only loss step (no guidance)
@jax.jit
def render_only(scene_params, state):
    def loss(p):
        scene = state.scene.replace_params(p)
        out = system.render_batch(scene, _CAMS, 1024, 1024)
        return jnp.sum(out["image"]) + jnp.sum(out["depth"]) * 1e-3
    return jax.grad(loss)(scene_params)

from humangaussian_tpu.data.cameras import sample_camera_batch
_CAMS = sample_camera_batch(jax.random.PRNGKey(3), 0, system.camera_cfg)
timeit("render_batch fwd+bwd (8 cams, remat)", render_only, state.scene.params(), state)

# pose images
@jax.jit
def pose_only(cams):
    return system.pose_images(cams)
timeit("pose images (8x512^2)", pose_only, _CAMS)
