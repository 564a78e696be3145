"""Skeleton: SMPL-X-driven keypoints, scene init sampling, pose metadata.

TPU-native re-design of the reference `Skeleton`
(/root/reference/threestudio/utils/poser.py:106-459): owns the canonical
keypoint set (humansd-17 or openpose-18), maps SMPL-X joints to it,
applies the reference's normalization chain (recenter to bbox center,
rescale to a 0.6 box, OpenGL->blender y/z swap, poser.py:337-346; then
the system-level `scale(-10)` => x1.1^10, GaussianDreamer.py:122), and
samples surface points for Gaussian-scene initialization
(sample_smplx_points, poser.py:225-231 — re-implemented as area-weighted
triangle sampling without trimesh).

Skeleton state is a plain pytree of numpy arrays (host-side, one-time
setup like the reference's CPU smplx pass); drawing happens in
smplx/pose_image.py.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from humangaussian_tpu.smplx.lbs import SMPLXPose, lbs_forward
from humangaussian_tpu.smplx.model import SMPLXModel

# SMPL-X (55 joints + landmarks) -> openpose-18, poser.py:61-81
OPENPOSE18_FROM_SMPLX = np.array(
    [55, 12, 17, 19, 21, 16, 18, 20, 2, 5, 8, 1, 4, 7, 56, 57, 58, 59],
    dtype=np.int32,
)
OPENPOSE18_NAMES = (
    "nose", "neck", "right_shoulder", "right_elbow", "right_wrist",
    "left_shoulder", "left_elbow", "left_wrist", "right_hip", "right_knee",
    "right_ankle", "left_hip", "left_knee", "left_ankle", "right_eye",
    "left_eye", "right_ear", "left_ear",
)
OPENPOSE18_LINES = np.array(
    [[0, 1], [1, 2], [2, 3], [3, 4], [1, 5], [5, 6], [6, 7], [1, 8],
     [8, 9], [9, 10], [1, 11], [11, 12], [12, 13], [0, 14], [14, 16],
     [0, 15], [15, 17]],
    dtype=np.int32,
)

# SMPL-X -> humansd-17 (mmpose/COCO order), poser.py:83-104
HUMANSD17_FROM_SMPLX = np.array(
    [55, 57, 56, 59, 58, 16, 17, 18, 19, 20, 21, 1, 2, 4, 5, 7, 8],
    dtype=np.int32,
)
HUMANSD17_NAMES = (
    "nose", "left_eye", "right_eye", "left_ear", "right_ear",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_hip", "right_hip", "left_knee",
    "right_knee", "left_ankle", "right_ankle",
)
HUMANSD17_LINES = np.array(
    [[0, 1], [0, 2], [1, 3], [2, 4], [3, 5], [4, 6], [5, 7], [6, 8],
     [7, 9], [8, 10], [5, 11], [6, 12], [11, 13], [12, 14], [13, 15],
     [14, 16]],
    dtype=np.int32,
)

# A-pose body axis-angles (21 joints), poser.py:305-314
APOSE_BODY_POSE = np.zeros((21, 3), np.float32)
APOSE_BODY_POSE[0, 1] = 0.2
APOSE_BODY_POSE[0, 2] = 0.1
APOSE_BODY_POSE[1, 1] = -0.2
APOSE_BODY_POSE[1, 2] = -0.1
APOSE_BODY_POSE[15, 2] = -0.7853982
APOSE_BODY_POSE[16, 2] = 0.7853982
APOSE_BODY_POSE[19, 0] = 1.0
APOSE_BODY_POSE[20, 0] = 1.0


def joints_to_openpose18(joints: np.ndarray) -> np.ndarray:
    return np.asarray(joints)[OPENPOSE18_FROM_SMPLX]


def joints_to_humansd17(joints: np.ndarray) -> np.ndarray:
    return np.asarray(joints)[HUMANSD17_FROM_SMPLX]


def sample_mesh_surface(
    vertices: np.ndarray,
    faces: np.ndarray,
    n: int,
    rng: np.random.Generator | int | None = None,
) -> np.ndarray:
    """Area-weighted uniform surface sampling (trimesh.sample equivalent,
    used at poser.py:225-231 to seed the 100k-point Gaussian init)."""
    if not isinstance(rng, np.random.Generator):
        rng = np.random.default_rng(rng)
    v = np.asarray(vertices, np.float64)
    f = np.asarray(faces, np.int64)
    a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
    probs = areas / areas.sum()
    idx = rng.choice(f.shape[0], size=n, p=probs)
    r1 = np.sqrt(rng.random(n))
    r2 = rng.random(n)
    u = 1.0 - r1
    w = r1 * r2
    vv = r1 - w
    pts = u[:, None] * a[idx] + vv[:, None] * b[idx] + w[:, None] * c[idx]
    return pts.astype(np.float32)


@dataclasses.dataclass
class Skeleton:
    """Host-side skeleton state (numpy), mirroring poser.py's Skeleton."""

    style: str = "humansd"  # or "openpose"
    apose: bool = True
    points3d: np.ndarray | None = None  # [K,3] normalized keypoints
    vertices: np.ndarray | None = None  # [V,3] normalized SMPL-X verts
    faces: np.ndarray | None = None  # [F,3]
    ori_center: np.ndarray | None = None
    ori_scale: float | None = None

    @property
    def names(self):
        return HUMANSD17_NAMES if self.style == "humansd" else OPENPOSE18_NAMES

    @property
    def lines(self):
        return HUMANSD17_LINES if self.style == "humansd" else OPENPOSE18_LINES

    def load_smplx(
        self,
        model: SMPLXModel,
        betas=None,
        expression=None,
        body_pose: np.ndarray | None = None,
    ) -> "Skeleton":
        """SMPL-X forward (A-pose by default) + the reference normalization
        chain (poser.py:290-346). Returns self for chaining."""
        if body_pose is None:
            body_pose = APOSE_BODY_POSE if self.apose else np.zeros((21, 3))
        pose = SMPLXPose.rest(body_pose=np.asarray(body_pose, np.float32))
        verts, joints = lbs_forward(model, pose, betas, expression)
        verts = np.asarray(verts)
        joints = np.asarray(joints)

        kp = (
            joints_to_humansd17(joints)
            if self.style == "humansd"
            else joints_to_openpose18(joints)
        )

        vmin, vmax = verts.min(0), verts.max(0)
        self.ori_center = (vmax + vmin) / 2
        self.ori_scale = 0.6 / np.max(vmax - vmin)
        verts = (verts - self.ori_center) * self.ori_scale
        kp = (kp - self.ori_center) * self.ori_scale

        # OpenGL -> blender: swap y/z (poser.py:344-346)
        verts = verts[:, [0, 2, 1]]
        kp = kp[:, [0, 2, 1]]

        self.vertices = verts.astype(np.float32)
        self.faces = np.asarray(model.faces, np.int32)
        self.points3d = kp.astype(np.float32)
        return self

    def scale(self, delta: float) -> "Skeleton":
        """points/verts *= 1.1**(-delta); system calls scale(-10)
        (poser.py:349-352, GaussianDreamer.py:122)."""
        f = 1.1 ** (-delta)
        self.points3d = self.points3d * f
        if self.vertices is not None:
            self.vertices = self.vertices * f
        return self

    @property
    def hand_centers(self) -> np.ndarray:
        """[2,3] left/right wrist positions (hand-densify mask source,
        poser.py:177-181, GaussianDreamer.py:292-297)."""
        il = self.names.index("left_wrist")
        ir = self.names.index("right_wrist")
        return self.points3d[[il, ir]]

    def sample_smplx_points(self, n: int = 100_000, seed: int = 0) -> np.ndarray:
        assert self.vertices is not None, "call load_smplx first"
        return sample_mesh_surface(self.vertices, self.faces, n, seed)
