"""Pure-JAX SMPL-X linear blend skinning forward pass.

Replaces the torch `smplx` package the reference drives from
poser.py:290-322 and animation.py:273-303. Standard SMPL-X pipeline:

  v_shaped = T + S beta + E psi
  J        = regressor(v_shaped)
  v_posed  = v_shaped + P (R(theta) - I)
  verts    = sum_j w_j A_j(theta, J) v_posed      (LBS)

with A_j the world transform of joint j relative to its rest pose,
composed down the kinematic tree. Everything is differentiable and
jit-stable; the 55-joint chain compose is a static Python loop (unrolled
by XLA, 55 tiny 4x4 matmuls).

flat_hand_mean mirrors smplx.create(flat_hand_mean=True) as the reference
uses (poser.py:299): when False, the model's mean hand pose is added to
the given hand axis-angles.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.smplx.model import NUM_BODY_JOINTS, NUM_JOINTS, SMPLXModel


class SMPLXPose(NamedTuple):
    """Axis-angle pose parameters (all optional via zeros)."""

    global_orient: jnp.ndarray  # [3]
    body_pose: jnp.ndarray  # [21,3]
    jaw_pose: jnp.ndarray  # [3]
    leye_pose: jnp.ndarray  # [3]
    reye_pose: jnp.ndarray  # [3]
    left_hand_pose: jnp.ndarray  # [15,3]
    right_hand_pose: jnp.ndarray  # [15,3]

    @classmethod
    def rest(cls, body_pose: jnp.ndarray | None = None) -> "SMPLXPose":
        z3 = jnp.zeros((3,), jnp.float32)
        return cls(
            global_orient=z3,
            body_pose=jnp.zeros((NUM_BODY_JOINTS, 3), jnp.float32)
            if body_pose is None
            else jnp.asarray(body_pose, jnp.float32),
            jaw_pose=z3,
            leye_pose=z3,
            reye_pose=z3,
            left_hand_pose=jnp.zeros((15, 3), jnp.float32),
            right_hand_pose=jnp.zeros((15, 3), jnp.float32),
        )

    def full_pose(self, hands_mean=None, flat_hand_mean: bool = True):
        """[55,3] axis-angle in SMPL-X joint order."""
        lh, rh = self.left_hand_pose, self.right_hand_pose
        if not flat_hand_mean and hands_mean is not None:
            hm = jnp.asarray(hands_mean, jnp.float32).reshape(2, 15, 3)
            lh = lh + hm[0]
            rh = rh + hm[1]
        return jnp.concatenate(
            [
                self.global_orient[None],
                self.body_pose,
                self.jaw_pose[None],
                self.leye_pose[None],
                self.reye_pose[None],
                lh,
                rh,
            ],
            axis=0,
        )


def rodrigues(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [...,3] -> rotation matrices [...,3,3] (Rodrigues)."""
    angle = jnp.linalg.norm(aa, axis=-1, keepdims=True)  # [...,1]
    axis = aa / jnp.maximum(angle, 1e-8)
    s = jnp.sin(angle)[..., None]
    c = jnp.cos(angle)[..., None]
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(x)
    k = jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=-1),
            jnp.stack([z, zeros, -x], axis=-1),
            jnp.stack([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )  # [...,3,3]
    eye = jnp.eye(3, dtype=aa.dtype)
    return eye + s * k + (1.0 - c) * (k @ k)


def lbs_forward(
    model: SMPLXModel,
    pose: SMPLXPose,
    betas: jnp.ndarray | None = None,
    expression: jnp.ndarray | None = None,
    flat_hand_mean: bool = True,
):
    """SMPL-X forward. Returns (vertices [V,3], joints [55+L,3]) where the
    trailing L entries are the surface landmarks (nose/eyes/ears/...)
    appended in smplx package order so reference joint mappers apply."""
    v_template = jnp.asarray(model.v_template)
    j_count = model.num_joints
    parents = np.asarray(model.parents)  # static python ints for the loop

    v_shaped = v_template
    if betas is not None and model.shapedirs.size:
        v_shaped = v_shaped + jnp.einsum(
            "vcs,s->vc", jnp.asarray(model.shapedirs), jnp.asarray(betas)
        )
    if expression is not None and model.exprdirs.size:
        v_shaped = v_shaped + jnp.einsum(
            "vcs,s->vc", jnp.asarray(model.exprdirs), jnp.asarray(expression)
        )

    joints_rest = jnp.asarray(model.j_regressor) @ v_shaped  # [J,3]

    full_pose = pose.full_pose(model.hands_mean, flat_hand_mean)
    rmats = rodrigues(full_pose)  # [J,3,3]

    pose_feature = (rmats[1:] - jnp.eye(3, dtype=rmats.dtype)).reshape(-1)
    v_posed = v_shaped
    if model.posedirs.size:
        v_posed = v_posed + jnp.einsum(
            "vcp,p->vc", jnp.asarray(model.posedirs), pose_feature
        )

    # kinematic chain: world transform per joint
    def make_tf(r, t):
        top = jnp.concatenate([r, t[:, None]], axis=1)
        return jnp.concatenate(
            [top, jnp.array([[0.0, 0.0, 0.0, 1.0]], r.dtype)], axis=0
        )

    transforms = [make_tf(rmats[0], joints_rest[0])]
    for i in range(1, j_count):
        p = int(parents[i])
        local = make_tf(rmats[i], joints_rest[i] - joints_rest[p])
        transforms.append(transforms[p] @ local)
    world = jnp.stack(transforms)  # [J,4,4]
    joints_posed = world[:, :3, 3]

    # remove the rest-pose joint translation: A = T - [0 | R_w j_rest]
    correction = jnp.einsum("jab,jb->ja", world[:, :3, :3], joints_rest)
    rel = world.at[:, :3, 3].add(-correction)

    vert_tf = jnp.einsum("vj,jab->vab", jnp.asarray(model.lbs_weights), rel)
    verts = (
        jnp.einsum("vab,vb->va", vert_tf[:, :3, :3], v_posed)
        + vert_tf[:, :3, 3]
    )

    landmarks = verts[jnp.asarray(model.landmark_vertex_ids)]
    joints_out = jnp.concatenate([joints_posed, landmarks], axis=0)
    return verts, joints_out


def joint_world_rotations(model, pose: SMPLXPose) -> jnp.ndarray:
    """Global (world-frame) rotation of every kinematic joint, [J,3,3].

    The rotation-only forward kinematics of lbs_forward (its `world`
    transforms, :140-145) — used by the viewer's skeleton dragging to
    conjugate a screen-space rotation into a joint's parent frame
    (reference GUI: animation.py skeleton dragging, :700-931)."""
    aa = jnp.asarray(pose.full_pose(model.hands_mean, flat_hand_mean=True))
    rmats = rodrigues(aa.reshape(-1, 3))
    parents = np.asarray(model.parents)
    world = [rmats[0]]
    for i in range(1, model.num_joints):
        world.append(world[parents[i]] @ rmats[i])
    return jnp.stack(world)
