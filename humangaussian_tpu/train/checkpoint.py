"""Checkpoint/resume: one orbax pytree as the single source of truth.

The reference's durable artifact is only the exported PLY (its Lightning
checkpoint misses the Gaussian params entirely — SURVEY.md §5.4 /
GaussianDreamer.py:560-561). Here the full TrainState {padded scene,
Adam moments, densify stats, step, PRNG key} round-trips through orbax,
so training resumes bit-exactly; PLY export remains the interop artifact
(io/ply.py).
"""
from __future__ import annotations

import os

import jax
import numpy as np


def _mask_empty(tree):
    """orbax refuses zero-size arrays (e.g. sh_rest at degree 0) — swap
    them for a 1-element placeholder and restore the real empties from
    the template."""
    return jax.tree.map(
        lambda x: np.zeros((1,), np.float32) if x.size == 0 else x, tree
    )


def save_checkpoint(path: str, state) -> str:
    """Write `state` (any pytree) under `path` (a directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(path, _mask_empty(jax.device_get(state)), force=True)
    checkpointer.wait_until_finished()
    return path


def restore_checkpoint(path: str, template):
    """Restore a pytree saved by save_checkpoint; `template` supplies
    structure/shape/dtype (e.g. a freshly built TrainState)."""
    import orbax.checkpoint as ocp

    checkpointer = ocp.StandardCheckpointer()
    restored = checkpointer.restore(
        os.path.abspath(path), target=_mask_empty(jax.device_get(template))
    )
    return jax.tree.map(
        lambda t, r: np.asarray(t)
        if t.size == 0
        else np.asarray(r, t.dtype).reshape(t.shape),
        template,
        restored,
    )
