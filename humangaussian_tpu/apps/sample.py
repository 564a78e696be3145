"""CLI: text -> (image, depth) sampling with the dual-branch prior.

Inference counterpart of the reference's pipeline_rgbdepth sampler:
renders the skeleton pose at a chosen azimuth, then jointly denoises rgb
and depth latents conditioned on it.

  python -m humangaussian_tpu.apps.sample --config configs/avatar.yaml \
      --prompt "A man in a suit" --azimuth 0 --out sample.png
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from humangaussian_tpu.apps.launch import build_system
    from humangaussian_tpu.config import load_config
    from humangaussian_tpu.data.cameras import (
        RandomCameraConfig,
        eval_camera_batch,
    )
    from humangaussian_tpu.utils.saving import save_image_grid

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--prompt", required=True)
    parser.add_argument("--azimuth", type=float, default=0.0)
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default="sample.png")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    cfg = load_config(
        args.config,
        args.overrides + [f"system.prompt_processor.prompt={args.prompt}"],
    )
    system = build_system(cfg)

    cam_cfg = RandomCameraConfig(n_test_views=1)
    cams = eval_camera_batch(cam_cfg, "test")
    pose = system.pose_images(cams)

    emb = system.prompt_embeddings
    ele = jnp.zeros((1,))
    azi = jnp.full((1,), args.azimuth)
    text3 = emb.get_text_embeddings(ele, azi)
    text2 = text3[:2]  # [cond | neg]

    rng = jax.random.PRNGKey(args.seed)
    images, depths = system.guidance.sample_joint(
        pose, text2, rng, num_steps=args.steps
    )
    grid = [np.asarray(images[0]), np.asarray(depths[0]), np.asarray(pose[0])]
    save_image_grid(args.out, grid)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
