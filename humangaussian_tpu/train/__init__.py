from humangaussian_tpu.train.optim import (
    AdamState,
    GaussianOptimConfig,
    adam_init,
    adam_step,
    expon_lr,
)
from humangaussian_tpu.train.system import (
    GaussianDreamerConfig,
    GaussianDreamerSystem,
    TrainState,
)

__all__ = [
    "AdamState",
    "GaussianOptimConfig",
    "adam_init",
    "adam_step",
    "expon_lr",
    "GaussianDreamerConfig",
    "GaussianDreamerSystem",
    "TrainState",
]
