"""Training-step cost vs scene scale: the post-densification regime.

The 3600-step rehearsal collapsed from ~1.0 it/s at 100k alive to
<0.1 it/s at ~340k alive / bucket=None (full 524288 candidate domain).
This probe rebuilds the system at a configurable alive count + bucket
and times train_step, optionally under an XPlane trace, to bisect which
P/N-proportional stage blows up (binning sorts, carry-back fallback,
backward gathers, compositing kernels, HBM pressure).

  ALIVE=340000 BUCKET=0 TRACE=1 python benchmarks/probe_train_scale.py
  (BUCKET=0 -> None = full capacity)
"""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.data.cameras import RandomCameraConfig
from humangaussian_tpu.guidance.dual_branch import (
    DualBranchGuidance, GuidanceConfig)
from humangaussian_tpu.guidance.schedule import DiffusionSchedule
from humangaussian_tpu.guidance.unet import DualBranchUNet, SD2_BASE_CONFIG
from humangaussian_tpu.guidance.vae import AutoencoderKL, VAEConfig
from humangaussian_tpu.guidance.prompt import PromptEmbeddings
from humangaussian_tpu.ops.projection import RasterizeConfig
from humangaussian_tpu.smplx.model import toy_model
from humangaussian_tpu.smplx.skeleton import Skeleton
from humangaussian_tpu.train.system import (
    GaussianDreamerConfig, GaussianDreamerSystem)

ALIVE = int(os.environ.get("ALIVE", "340000"))
CAPACITY = int(os.environ.get("CAPACITY", str(1 << 19)))
BUCKET = int(os.environ.get("BUCKET", "0")) or None
ITERS = int(os.environ.get("ITERS", "5"))
TRACE = os.environ.get("TRACE", "")
SKIP_GUIDANCE = os.environ.get("SKIP_GUIDANCE", "")

rng = jax.random.PRNGKey(0)
print(f"alive={ALIVE} capacity={CAPACITY} bucket={BUCKET}", flush=True)

if SKIP_GUIDANCE:
    from humangaussian_tpu.guidance.unet import TINY_TEST_CONFIG
    from humangaussian_tpu.guidance.vae import tiny_vae_config
    unet = DualBranchUNet(TINY_TEST_CONFIG)
    x1 = jnp.zeros((1, 8, 8, 8))
    up = jax.jit(unet.init)(rng, x1, x1, jnp.zeros((1,)),
                            jnp.zeros((1, 7, 32)), jnp.zeros((1, 6)))
    vae = AutoencoderKL(tiny_vae_config())
    vp = jax.jit(vae.init)(rng, jnp.zeros((1, 16, 16, 3)), rng)
    gcfg = GuidanceConfig(latent_size=8, image_size=16, remat_encode=False)
    emb_d = 32
else:
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
    gcfg = GuidanceConfig(latent_size=64, image_size=512, remat_encode=False)
    emb_d = 1024

guidance = DualBranchGuidance(
    unet=unet, unet_params=up, vae=vae, vae_params=vp,
    schedule=DiffusionSchedule.create(), cfg=gcfg,
)
emb = PromptEmbeddings(
    text_vd=jax.random.normal(rng, (4, 77, emb_d)),
    uncond_vd=jax.random.normal(rng, (4, 77, emb_d)),
    text=jnp.zeros((77, emb_d)), uncond=jnp.zeros((77, emb_d)),
    null=jnp.zeros((77, emb_d)),
)
skel = Skeleton(style="humansd", apose=True).load_smplx(toy_model()).scale(-10)
REMAT = os.environ.get("REMAT", "1") not in ("0", "false")
system = GaussianDreamerSystem(
    GaussianDreamerConfig(capacity=CAPACITY, pts_num=100_000, max_steps=3600,
                          remat_render=REMAT),
    skel, guidance, emb,
    camera_cfg=RandomCameraConfig(batch_size=8, height=1024, width=1024),
    raster_cfg=RasterizeConfig(tile=32, max_tiles_per_gaussian=4,
                               pair_factor=4),
)
state = system.init_state(rng)

# grow the scene synthetically to ALIVE: jitter-clone existing gaussians
n0 = 100_000
if ALIVE > n0:
    k = jax.random.PRNGKey(1)
    extra = ALIVE - n0
    src = jax.random.randint(k, (extra,), 0, n0)
    sc = state.scene

    def grow(x):
        if x.ndim >= 1 and x.shape[0] == CAPACITY:
            upd = x[src]
            if x.dtype in (jnp.float32, jnp.bfloat16) and x.ndim >= 2:
                upd = upd + 0.01 * jax.random.normal(k, upd.shape, x.dtype)
            return x.at[n0:ALIVE].set(upd)
        return x

    new_scene = jax.tree.map(grow, sc)
    new_scene = new_scene._replace(
        alive=jnp.arange(CAPACITY) < ALIVE,
        means=new_scene.means.at[n0:ALIVE].add(
            0.05 * jax.random.normal(k, (ALIVE - n0, 3))),
    )
    try:
        state = state.replace(scene=new_scene)
    except AttributeError:
        state = state._replace(scene=new_scene)
    # optimizer state leaves sized by capacity are fine as-is (zeros)

print("compiling step...", flush=True)
t0 = time.time()
state2, m = system.train_step(state, BUCKET)
float(m["loss"])
print(f"compile+1st step: {time.time()-t0:.1f}s  n_alive={int(m['n_alive'])} "
      f"overflow={int(m['overflow'])}", flush=True)

if TRACE:
    from humangaussian_tpu.utils.profiling import capture_trace
    with capture_trace("/tmp/step_trace_scale"):
        st, mm = system.train_step(state, BUCKET)
        jax.block_until_ready(mm["loss"])
    print("trace -> /tmp/step_trace_scale", flush=True)

t0 = time.time()
st = state
for _ in range(ITERS):
    st, mm = system.train_step(st, BUCKET)
float(mm["loss"])  # host fetch: the only true sync through the relay
dt = (time.time() - t0) / ITERS
print(json.dumps(dict(
    alive=ALIVE, bucket=BUCKET or CAPACITY, s_per_step=round(dt, 3),
    it_per_s=round(1 / dt, 3), overflow=int(mm["overflow"]),
)), flush=True)
