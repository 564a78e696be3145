"""CLI: zero-shot animation of a trained avatar with an AMASS motion.

Headless equivalent of the reference's `python animation.py --ply ...
--motion ... --play [--rotate]` (animation.py:940-1020): loads the
avatar PLY (with the animation coordinate shim), binds it to the SMPL-X
mesh once, re-poses per motion frame and renders a 30 fps orbit-or-fixed
camera video.
"""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    import jax.numpy as jnp

    from humangaussian_tpu.animation import AvatarAnimator, load_amass_body_poses
    from humangaussian_tpu.core.camera import camera_from_c2w, look_at_c2w
    from humangaussian_tpu.io.ply import load_ply
    from humangaussian_tpu.smplx.lbs import SMPLXPose
    from humangaussian_tpu.smplx.model import load_smplx_npz
    from humangaussian_tpu.utils.saving import save_video

    parser = argparse.ArgumentParser()
    parser.add_argument("--ply", required=True)
    parser.add_argument("--motion", required=True, help="AMASS npz")
    parser.add_argument("--smplx_path", required=True)
    parser.add_argument("--gender", default="neutral")
    parser.add_argument("--out", default="animation.mp4")
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--radius", type=float, default=2.0)
    parser.add_argument("--rotate", action="store_true")
    parser.add_argument("--max_frames", type=int, default=0)
    parser.add_argument("--fps", type=int, default=30)
    args = parser.parse_args(argv)

    scene = load_ply(args.ply, animation_convention=True)
    model = load_smplx_npz(args.smplx_path, gender=args.gender)
    animator = AvatarAnimator(scene, model)
    print(f"bound {animator.n_gaussians} gaussians to the SMPL-X mesh")

    body_poses = load_amass_body_poses(args.motion)
    if args.max_frames:
        body_poses = body_poses[: args.max_frames]

    bg = jnp.ones((3,), jnp.float32)
    frames = []
    n = len(body_poses)
    for i, bp in enumerate(body_poses):
        angle = 2 * np.pi * i / n if args.rotate else 0.0
        eye = jnp.array(
            [args.radius * np.sin(angle), 0.3, args.radius * np.cos(angle)],
            jnp.float32,
        )
        cam = camera_from_c2w(
            look_at_c2w(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])),
            0.9, args.size, args.size,
        )
        pose = SMPLXPose.rest(body_pose=jnp.asarray(bp))
        out = animator.render_frame(pose, cam, bg)
        frames.append(np.asarray(out["image"]))
        if (i + 1) % 10 == 0:
            print(f"frame {i + 1}/{n}")

    path = save_video(args.out, frames, fps=args.fps)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
