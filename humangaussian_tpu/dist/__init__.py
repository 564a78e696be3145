from humangaussian_tpu.dist.parallel import (
    make_mesh,
    make_dp_train_step,
    multihost_init,
)

__all__ = ["make_mesh", "make_dp_train_step", "multihost_init"]
