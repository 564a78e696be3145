from humangaussian_tpu.core.sh import eval_sh, rgb_to_sh, sh_to_rgb, SH_C0
from humangaussian_tpu.core.camera import (
    Camera,
    fov_to_focal,
    focal_to_fov,
    perspective_projection,
    camera_from_c2w,
    look_at_c2w,
)
from humangaussian_tpu.core.scene import GaussianScene

__all__ = [
    "eval_sh",
    "rgb_to_sh",
    "sh_to_rgb",
    "SH_C0",
    "Camera",
    "fov_to_focal",
    "focal_to_fov",
    "perspective_projection",
    "camera_from_c2w",
    "look_at_c2w",
    "GaussianScene",
]
