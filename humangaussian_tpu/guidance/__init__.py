from humangaussian_tpu.guidance.schedule import DiffusionSchedule
from humangaussian_tpu.guidance.vae import AutoencoderKL, VAEConfig
from humangaussian_tpu.guidance.unet import (
    DualBranchUNet,
    UNetConfig,
    SD2_BASE_CONFIG,
    TINY_TEST_CONFIG,
)

__all__ = [
    "DiffusionSchedule",
    "AutoencoderKL",
    "VAEConfig",
    "DualBranchUNet",
    "UNetConfig",
    "SD2_BASE_CONFIG",
    "TINY_TEST_CONFIG",
]
