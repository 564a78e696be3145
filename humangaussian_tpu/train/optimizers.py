"""parse_optimizer / parse_scheduler: config-driven optimizer assembly.

The TPU analogue of /root/reference/threestudio/systems/utils.py:34-86
(name -> torch optimizer class + per-group params) on optax: a name and
an args dict resolve to a GradientTransformation, optionally wrapped in
a learning-rate schedule (parse_scheduler supports the reference's
interval semantics for step-based schedules).
"""
from __future__ import annotations

import optax

from humangaussian_tpu.train.adan import adan


def parse_optimizer(name: str, **args) -> optax.GradientTransformation:
    """name in {adam, adamw, sgd, adan}; args follow torch conventions
    (lr, betas, eps, weight_decay) like the reference configs."""
    lr = args.pop("lr", 1e-3)
    betas = args.pop("betas", None)
    name = name.lower()
    if name == "adam":
        b1, b2 = betas or (0.9, 0.999)
        return optax.adam(lr, b1=b1, b2=b2, eps=args.pop("eps", 1e-8))
    if name == "adamw":
        b1, b2 = betas or (0.9, 0.999)
        return optax.adamw(
            lr, b1=b1, b2=b2, eps=args.pop("eps", 1e-8),
            weight_decay=args.pop("weight_decay", 1e-2),
        )
    if name == "sgd":
        return optax.sgd(lr, momentum=args.pop("momentum", 0.0))
    if name == "adan":
        b1, b2, b3 = betas or (0.98, 0.92, 0.99)
        return adan(
            lr, b1=b1, b2=b2, b3=b3, eps=args.pop("eps", 1e-8),
            weight_decay=args.pop("weight_decay", 0.0),
            max_grad_norm=args.pop("max_grad_norm", 0.0),
        )
    raise ValueError(f"unknown optimizer {name!r}")


def parse_scheduler(name: str, lr: float, max_steps: int, **args):
    """name in {constant, linear, exponential, multistep} -> optax
    schedule callable (systems/utils.py parse_scheduler interval=step)."""
    name = name.lower()
    if name == "constant":
        return optax.constant_schedule(lr)
    if name == "linear":
        return optax.linear_schedule(
            lr, args.get("end_lr", 0.0), max_steps
        )
    if name == "exponential":
        return optax.exponential_decay(
            lr, max_steps, args.get("gamma", 0.1)
        )
    if name == "multistep":
        milestones = args.get("milestones", [max_steps // 2])
        gamma = args.get("gamma", 0.5)
        return optax.piecewise_constant_schedule(
            lr, {int(m): gamma for m in milestones}
        )
    raise ValueError(f"unknown scheduler {name!r}")
