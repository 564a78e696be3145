"""Full Structure-Aware SDS training step at reference scale, chained.

Reference budget: ~1.0 it/s on A100 40GB (BASELINE.md): batch 8 cameras
x 1024^2 renders, 512^2 dual-branch SD2 guidance (900M-param UNet,
random weights = identical compute), 100k live Gaussians.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.data.cameras import RandomCameraConfig
from humangaussian_tpu.guidance.dual_branch import DualBranchGuidance, GuidanceConfig
from humangaussian_tpu.guidance.schedule import DiffusionSchedule
from humangaussian_tpu.guidance.unet import DualBranchUNet, SD2_BASE_CONFIG
from humangaussian_tpu.guidance.vae import AutoencoderKL, VAEConfig
from humangaussian_tpu.guidance.prompt import PromptEmbeddings
from humangaussian_tpu.ops.projection import RasterizeConfig
from humangaussian_tpu.smplx.model import toy_model
from humangaussian_tpu.smplx.skeleton import Skeleton
from humangaussian_tpu.train.system import GaussianDreamerConfig, GaussianDreamerSystem

ITERS = int(os.environ.get("ITERS", "5"))
rng = jax.random.PRNGKey(0)

print("building 900M-param guidance (random weights)...", flush=True)
unet = DualBranchUNet(SD2_BASE_CONFIG)
x1 = jnp.zeros((1, 64, 64, 8))
up = jax.jit(unet.init)(rng, x1, x1, jnp.zeros((1,)), jnp.zeros((1, 77, 1024)),
                        jnp.zeros((1, 6)))
vae = AutoencoderKL(VAEConfig())
vp = jax.jit(vae.init)(rng, jnp.zeros((1, 64, 64, 3)), rng)
n_params = sum(x.size for x in jax.tree.leaves(up))
print(f"unet params: {n_params/1e6:.1f}M", flush=True)
guidance = DualBranchGuidance(
    unet=unet, unet_params=up, vae=vae, vae_params=vp,
    schedule=DiffusionSchedule.create(),
    cfg=GuidanceConfig(latent_size=64, image_size=512,
                       remat_encode=os.environ.get("REMAT", "0") == "1"),
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
    # 2x2 tile rect (16 px splat radius cap): training-time default —
    # init splats are ~7-9 px, and the economical rect halves the
    # candidate domain that dominates the render backward
    # (configs/avatar.yaml rasterizer note); eval renders keep 3x3.
    raster_cfg=RasterizeConfig(tile=32, max_tiles_per_gaussian=4,
                               pair_factor=int(os.environ.get("PF", "3"))),
)
state = system.init_state(rng)
print("state ready; compiling train_step...", flush=True)

t0 = time.perf_counter()
state, m = system.train_step(state)
jax.block_until_ready(m["loss"])
print(f"first step (compile) {time.perf_counter()-t0:.1f}s "
      f"loss={float(m['loss']):.3f}", flush=True)

# chained steady-state: train_step is inherently chained (state feeds
# state), so sequential calls measure real throughput
t0 = time.perf_counter()
for _ in range(ITERS):
    state, m = system.train_step(state)
float(m["loss"])  # host fetch: the only true sync through the relay
dt = (time.perf_counter() - t0) / ITERS
print(f"SDS step: {dt*1e3:.0f} ms = {1.0/dt:.3f} it/s "
      f"(A100 reference ~1.0 it/s)", flush=True)
