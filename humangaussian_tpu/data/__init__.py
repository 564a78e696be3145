from humangaussian_tpu.data.cameras import (
    RandomCameraConfig,
    CameraBatch,
    sample_camera_batch,
    eval_camera_batch,
    get_projection_matrix,
    get_mvp_matrix,
)

__all__ = [
    "RandomCameraConfig",
    "CameraBatch",
    "sample_camera_batch",
    "eval_camera_batch",
    "get_projection_matrix",
    "get_mvp_matrix",
]
