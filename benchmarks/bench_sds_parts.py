"""Chained component split of the SDS step: render batch vs guidance.

All large pytrees (scene params, UNet/VAE params, guidance bundle) are
passed as jit ARGUMENTS — closing over them would bake GBs of constants
into each chain (3.7GB captured-constant warning + huge compiles).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.data.cameras import RandomCameraConfig, sample_camera_batch
from humangaussian_tpu.guidance.dual_branch import DualBranchGuidance, GuidanceConfig
from humangaussian_tpu.guidance.schedule import DiffusionSchedule
from humangaussian_tpu.guidance.unet import DualBranchUNet, SD2_BASE_CONFIG
from humangaussian_tpu.guidance.vae import AutoencoderKL, VAEConfig
from humangaussian_tpu.ops.projection import RasterizeConfig
from humangaussian_tpu.smplx.model import toy_model
from humangaussian_tpu.smplx.skeleton import Skeleton
from humangaussian_tpu.train.system import GaussianDreamerConfig, GaussianDreamerSystem

ITERS = int(os.environ.get("ITERS", "5"))
ONLY = os.environ.get("ONLY", "")
rng = jax.random.PRNGKey(0)
unet = DualBranchUNet(SD2_BASE_CONFIG)
x1 = jnp.zeros((1, 64, 64, 8))
up = jax.jit(unet.init)(rng, x1, x1, jnp.zeros((1,)), jnp.zeros((1, 77, 1024)), jnp.zeros((1, 6)))
up = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, up)
vae = AutoencoderKL(VAEConfig())
vp = jax.jit(vae.init)(rng, jnp.zeros((1, 64, 64, 3)), rng)
vp = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, vp)
guidance = DualBranchGuidance(
    unet=unet, unet_params=up, vae=vae, vae_params=vp,
    schedule=DiffusionSchedule.create(),
    cfg=GuidanceConfig(latent_size=64, image_size=512),
)
skel = Skeleton(style="humansd", apose=True).load_smplx(toy_model()).scale(-10)
ALIVE = int(os.environ.get("ALIVE", "100000"))  # scene density knob
CAPACITY = int(os.environ.get("CAPACITY", str(1 << 17)))
TILE_CAP = int(os.environ.get("TILE_CAP", "4096"))
system = GaussianDreamerSystem(
    GaussianDreamerConfig(capacity=CAPACITY, pts_num=100_000,
                          tile_capacity=TILE_CAP),
    skel, guidance, None,
    camera_cfg=RandomCameraConfig(batch_size=8, height=1024, width=1024),
    raster_cfg=RasterizeConfig(tile=32, max_tiles_per_gaussian=4,
                               pair_factor=4),
)
state = system.init_state(rng)
if ALIVE > 100_000:
    # densify the scene synthetically: replicate surface points with
    # jitter (the post-densification regime the rehearsal reaches)
    sc = state.scene
    reps = -(-ALIVE // 100_000)
    k = jax.random.PRNGKey(7)
    idx = jnp.tile(jnp.arange(100_000), reps)[:ALIVE]
    jit = jax.random.normal(k, (ALIVE, 3)) * 0.25  # spread replicas: the
    # rehearsal scene is SDS-scattered, not stacked
    def grow(a):
        return a.at[:ALIVE].set(a[idx])
    sc = sc._replace(
        means=sc.means.at[:ALIVE].set(sc.means[idx] + jit),
        log_scales=grow(sc.log_scales), quats=grow(sc.quats),
        sh_dc=grow(sc.sh_dc), sh_rest=grow(sc.sh_rest),
        opacity_logits=grow(sc.opacity_logits),
        alive=sc.alive.at[:ALIVE].set(True),
    )
    state = state._replace(scene=sc)
print(f"alive={int(np.asarray(state.scene.alive.sum()))} "
      f"capacity={CAPACITY} tile_cap={TILE_CAP}", flush=True)
cams = sample_camera_batch(jax.random.PRNGKey(3), 0, system.camera_cfg)
print("ready", flush=True)


def bench_chain(name, step, init, *extra):
    if ONLY and ONLY not in name:
        return

    @jax.jit
    def run(x0, *e):
        return jax.lax.fori_loop(0, ITERS, lambda i, x: step(x, i, *e), x0)

    out = run(init, *extra)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(jax.tree.map(
        lambda a: a + 1e-6 if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, init), *extra)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/ITERS*1e3:.0f} ms", flush=True)


# 1. render batch fwd+bwd
params0 = state.scene.params()
scene0 = state.scene


def render_step(p, i, scene):
    def loss(q):
        sc = scene.replace_params(q)
        out = system.render_batch(sc, cams, 1024, 1024)
        return jnp.sum(out["image"]) + jnp.sum(out["depth"]) * 1e-3
    g = jax.grad(loss)(p)
    return jax.tree.map(lambda a, b: a + b * 1e-12, p, g)


bench_chain("render batch (8x1024^2) fwd+bwd", render_step, params0, scene0)

# 2. guidance fwd+bwd on synthetic renders
imgs0 = jax.random.uniform(rng, (8, 1024, 1024, 3))
text3 = jax.random.normal(rng, (24, 77, 1024))


def guide_step(im, i, gd):
    def loss(x):
        out = gd(x, x, x, text3, jnp.full((8,), 500, jnp.int32), rng)
        return out["loss_sds"]
    g = jax.grad(loss)(im)
    return im + g * 1e-12


bench_chain("guidance fwd+bwd (8 cams)", guide_step, imgs0, guidance)

# 3. UNet fwd only (24 latents)
xb0 = jax.random.normal(rng, (24, 64, 64, 8))
ctx = jax.random.normal(rng, (24, 77, 1024))
tt = jnp.full((24,), 500.0)
tids = jnp.ones((24, 6))


def unet_step(xb, i, p):
    out = unet.apply(p, xb, xb, tt, ctx, tids)
    return xb + out[..., :8] * 1e-12


bench_chain("unet fwd 24x64^2", unet_step, xb0, up)

# 4. VAE encode fwd+bwd (8x512^2, x2 for rgb+depth grads + 1 fwd pose)
img512 = jax.random.normal(rng, (8, 512, 512, 3))


def vae_step(im, i, p):
    def loss(x):
        m, _ = vae.apply(p, x, method=vae.encode)
        return jnp.sum(m * m)
    g = jax.grad(loss)(im)
    return im + g * 1e-12


bench_chain("vae encode fwd+bwd 8x512^2", vae_step, img512, vp)


# 5. pose images
def pose_step(x, i):
    imgs = system.pose_images(cams)
    return x + imgs[0, 0, 0, 0] * 1e-12


bench_chain("pose images 8x512^2", pose_step, jnp.zeros(()))
