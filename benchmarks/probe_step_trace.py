"""XPlane trace of the full in-situ SDS train step (reference scale)."""
import os, sys, glob
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from humangaussian_tpu.data.cameras import RandomCameraConfig
from humangaussian_tpu.guidance.dual_branch import (
    DualBranchGuidance, GuidanceConfig)
from humangaussian_tpu.guidance.schedule import DiffusionSchedule
from humangaussian_tpu.guidance.unet import DualBranchUNet, SD2_BASE_CONFIG
from humangaussian_tpu.guidance.prompt import PromptEmbeddings
from humangaussian_tpu.guidance.vae import AutoencoderKL, VAEConfig
from humangaussian_tpu.ops.projection import RasterizeConfig
from humangaussian_tpu.smplx.model import toy_model
from humangaussian_tpu.smplx.skeleton import Skeleton
from humangaussian_tpu.train.system import (
    GaussianDreamerConfig, GaussianDreamerSystem)

rng = jax.random.PRNGKey(0)
unet = DualBranchUNet(SD2_BASE_CONFIG)
x1 = jnp.zeros((1, 64, 64, 8))
up = jax.jit(unet.init)(rng, x1, x1, jnp.zeros((1,)),
                        jnp.zeros((1, 77, 1024)), jnp.zeros((1, 6)))
up = jax.tree.map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, up)
vae = AutoencoderKL(VAEConfig())
vp = jax.jit(vae.init)(rng, jnp.zeros((1, 64, 64, 3)), rng)
vp = jax.tree.map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, vp)
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
    GaussianDreamerConfig(capacity=1 << 17, pts_num=100_000),
    skel, guidance, emb,
    camera_cfg=RandomCameraConfig(batch_size=8, height=1024, width=1024),
    raster_cfg=RasterizeConfig(tile=32, max_tiles_per_gaussian=9,
                               pair_factor=4),
)
state = system.init_state(rng)
state, m = system.train_step(state)
jax.block_until_ready(m["loss"])
print("warm", flush=True)
logdir = "/tmp/step_trace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    for _ in range(2):
        state, m = system.train_step(state)
    jax.block_until_ready(m["loss"])
print(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True), flush=True)
