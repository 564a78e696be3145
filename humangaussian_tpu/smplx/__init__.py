from humangaussian_tpu.smplx.model import (
    SMPLXModel,
    load_smplx_npz,
    toy_model,
    NUM_BODY_JOINTS,
    NUM_JOINTS,
)
from humangaussian_tpu.smplx.lbs import lbs_forward, rodrigues, SMPLXPose
from humangaussian_tpu.smplx.skeleton import (
    Skeleton,
    APOSE_BODY_POSE,
    joints_to_openpose18,
    joints_to_humansd17,
)
from humangaussian_tpu.smplx.pose_image import (
    draw_humansd_pose,
    draw_openpose_pose,
    humansd_colors,
)

__all__ = [
    "SMPLXModel",
    "load_smplx_npz",
    "toy_model",
    "NUM_BODY_JOINTS",
    "NUM_JOINTS",
    "lbs_forward",
    "rodrigues",
    "SMPLXPose",
    "Skeleton",
    "APOSE_BODY_POSE",
    "joints_to_openpose18",
    "joints_to_humansd17",
    "draw_humansd_pose",
    "draw_openpose_pose",
    "humansd_colors",
]
