"""End-to-end SDS training-step benchmark at reference scale.

Builds the REAL-size stack — SD2-base dual-branch UNet (randomly
initialized; identical compute to converted weights), full VAE, 100k
Gaussians, batch 8 cameras at 1024^2 — and times one jitted train step
(render fwd -> VAE encodes -> 3B UNet forward -> rasterizer backward ->
Adam). Reference baseline: ~1.0 it/s on A100 40GB (BASELINE.md).

Usage: python benchmarks/bench_sds.py [--batch 8] [--res 1024] [--iters 5]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--res", type=int, default=1024)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--capacity", type=int, default=1 << 17)
    parser.add_argument("--tiny-unet", action="store_true")
    parser.add_argument("--no-remat", action="store_true")
    parser.add_argument("--bf16-params", action="store_true")
    parser.add_argument("--tile-capacity", type=int, default=4096)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from humangaussian_tpu.data.cameras import RandomCameraConfig
    from humangaussian_tpu.guidance.dual_branch import (
        DualBranchGuidance,
        GuidanceConfig,
    )
    from humangaussian_tpu.guidance.prompt import PromptEmbeddings
    from humangaussian_tpu.guidance.schedule import DiffusionSchedule
    from humangaussian_tpu.guidance.unet import (
        DualBranchUNet,
        SD2_BASE_CONFIG,
        TINY_TEST_CONFIG,
    )
    from humangaussian_tpu.guidance.vae import AutoencoderKL, VAEConfig, tiny_vae_config
    from humangaussian_tpu.ops.projection import RasterizeConfig
    from humangaussian_tpu.smplx.model import toy_model
    from humangaussian_tpu.smplx.skeleton import Skeleton
    from humangaussian_tpu.train.system import (
        GaussianDreamerConfig,
        GaussianDreamerSystem,
    )

    rng = jax.random.PRNGKey(0)
    if args.tiny_unet:
        ucfg, vcfg = TINY_TEST_CONFIG, tiny_vae_config()
        ctx_dim, latent, img = 32, 8, 16
    else:
        ucfg, vcfg = SD2_BASE_CONFIG, VAEConfig()
        ctx_dim, latent, img = 1024, 64, 512

    unet = DualBranchUNet(ucfg)
    x = jnp.zeros((1, latent, latent, 8), jnp.float32)
    t0 = time.time()
    uparams = jax.jit(unet.init)(
        rng, x, x, jnp.zeros((1,)), jnp.zeros((1, 77, ctx_dim)),
        jnp.zeros((1, 6)),
    )
    n_params = sum(p.size for p in jax.tree.leaves(uparams))
    print(f"unet params: {n_params/1e6:.1f}M (init {time.time()-t0:.1f}s)", flush=True)
    vae = AutoencoderKL(vcfg)
    vparams = jax.jit(vae.init)(rng, jnp.zeros((1, img, img, 3)), rng)
    if args.bf16_params:
        cast = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, t)
        uparams, vparams = cast(uparams), cast(vparams)

    guidance = DualBranchGuidance(
        unet=unet, unet_params=uparams, vae=vae, vae_params=vparams,
        schedule=DiffusionSchedule.create(),
        cfg=GuidanceConfig(latent_size=latent, image_size=img),
    )
    emb = PromptEmbeddings(
        text_vd=jax.random.normal(rng, (4, 77, ctx_dim)),
        uncond_vd=jax.random.normal(rng, (4, 77, ctx_dim)),
        text=jnp.zeros((77, ctx_dim)),
        uncond=jnp.zeros((77, ctx_dim)),
        null=jnp.zeros((77, ctx_dim)),
    )
    skel = Skeleton(style="humansd", apose=True).load_smplx(toy_model()).scale(-10)
    system = GaussianDreamerSystem(
        GaussianDreamerConfig(
            capacity=args.capacity,
            pts_num=min(100_000, args.capacity // 2),
            remat_render=not args.no_remat,
            tile_capacity=args.tile_capacity,
        ),
        skel, guidance, emb,
        camera_cfg=RandomCameraConfig(
            batch_size=args.batch, height=args.res, width=args.res
        ),
        raster_cfg=RasterizeConfig(tile=32, max_tiles_per_gaussian=16),
    )
    state = system.init_state(rng)

    t0 = time.time()
    state, metrics = system.train_step(state)
    jax.block_until_ready(metrics)
    print(f"compile+first step: {time.time()-t0:.1f}s loss={float(metrics['loss']):.3f}", flush=True)

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        state, metrics = system.train_step(state)
        jax.block_until_ready(metrics)
        times.append(time.perf_counter() - t0)
    import numpy as np

    med = float(np.median(times))
    print(
        json.dumps(
            {
                "metric": "sds_iters_per_s",
                "value": round(1.0 / med, 3),
                "unit": "it/s",
                "vs_baseline": round((1.0 / med) / 1.0, 3),  # A100 ~1 it/s
                "step_ms": round(med * 1e3, 1),
                "step_ms_best": round(min(times) * 1e3, 1),
                "batch": args.batch,
                "res": args.res,
                "backend": jax.default_backend(),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
