"""Time-varying scalar schedules: the reference's C() convention.

C(value, step): scalars pass through; a 4-list [start_step, start_value,
end_value, end_step] linearly interpolates between start_value and
end_value as step goes start_step -> end_step, clamped outside
(/root/reference/threestudio/utils/misc.py:65-86). Used for grad_clip,
min/max timestep percents and loss weights (configs/test.yaml:70,
dual_branch_guidance.py:1052-1062).
"""
from __future__ import annotations

import jax.numpy as jnp


def C_schedule(value, step):
    """Evaluate a C()-style scalar at `step` (step may be traced)."""
    if isinstance(value, (int, float)):
        return jnp.asarray(value, jnp.float32)
    if len(value) != 4:
        raise ValueError(f"C schedule needs 4 entries, got {value!r}")
    start_step, start_value, end_value, end_step = value
    t = jnp.clip(
        (jnp.asarray(step, jnp.float32) - start_step)
        / max(end_step - start_step, 1e-8),
        0.0,
        1.0,
    )
    return start_value + (end_value - start_value) * t
