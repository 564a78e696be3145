"""Adaptive density control: functional, fixed-capacity, recompile-free.

TPU-native re-design of the reference's densify/prune machinery
(/root/reference/gaussiansplatting/scene/gaussian_model.py:359-438 and its
invocation from threestudio/systems/GaussianDreamer.py:378-408). The
reference reallocates parameter tensors and rewrites Adam state on every
densify; on TPU that would recompile the training program each time.
Here the scene is a padded pytree of static capacity (core/scene.py) and
every structural change is a masked scatter:

- clone/split children are written into currently-free slots (dead slots
  plus the slots of splitting parents, which die in the same pass);
- pruning just clears `alive` bits;
- Adam moments for (re)allocated slots are zeroed in the same scatter,
  mirroring cat_tensors_to_optimizer/_prune_optimizer
  (gaussian_model.py:268-337).

Semantics match the reference exactly, including its quirks:

- clone:  grad >= tau and max(scale) <= percent_dense * extent; child is a
  verbatim copy (gaussian_model.py:385-397).
- split:  grad >= tau and max(scale) >  percent_dense * extent; N=2
  children sampled from N(mean, R diag(scale) eps), scale / (0.8 * N);
  parent dies (gaussian_model.py:359-382).
- prune (inside densify_and_prune): evaluated on the POST-densify scene;
  opacity < min_opacity, or — when size_threshold is set — screen radius
  or world size too big. NOTE the reference zeroes max_radii2D in
  densification_postfix before this check (gaussian_model.py:356-357,405),
  so the screen-size branch never fires there; we reproduce that by
  evaluating it against the post-reset (zero) radii.
- prune_only: opacity < min_opacity or max(scale) > size_thresh — the
  HumanGaussian floater-removal phase (gaussian_model.py:426-432).
- densify_and_prune resets grad stats and max_radii2D for all points;
  prune_only leaves survivors' stats in place (prune_points slices,
  gaussian_model.py:304-318).
- Children never split in the pass that created them (the reference's
  zero-padded grads, gaussian_model.py:361-364): both masks are computed
  from the pre-densify gradient stats.

When free capacity runs out, children are dropped in reference append
order (all clones first, then split children) and reported in
`DensifyInfo.n_dropped` — the static-capacity analogue of CUDA OOM.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from humangaussian_tpu.core.scene import GaussianScene, quat_to_rotmat


class DensifyState(NamedTuple):
    """Per-slot densification statistics (GaussianDreamer.py:384-391)."""

    grad_accum: jnp.ndarray  # [C] sum of ||d loss / d means2d||_2 over steps
    denom: jnp.ndarray  # [C] number of steps the Gaussian was visible
    max_radii2d: jnp.ndarray  # [C] running max screen radius (pixels)


def init_densify_state(capacity: int) -> DensifyState:
    z = jnp.zeros((capacity,), jnp.float32)
    return DensifyState(grad_accum=z, denom=z, max_radii2d=z)


def update_stats(
    ds: DensifyState,
    means2d_grad: jnp.ndarray,  # [C,2] summed screen-space gradient
    radii: jnp.ndarray,  # [C] int32 screen radii from the render
    visible: jnp.ndarray,  # [C] bool (radii > 0)
) -> DensifyState:
    """add_densification_stats + max_radii2D update
    (gaussian_model.py:434-438, GaussianDreamer.py:385-391)."""
    gnorm = jnp.linalg.norm(means2d_grad[:, :2], axis=-1)
    vis = visible.astype(jnp.float32)
    return DensifyState(
        grad_accum=ds.grad_accum + gnorm * vis,
        denom=ds.denom + vis,
        max_radii2d=jnp.maximum(ds.max_radii2d, radii.astype(jnp.float32) * vis),
    )


class DensifyInfo(NamedTuple):
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray
    n_dropped: jnp.ndarray  # children lost to the capacity cap
    n_alive: jnp.ndarray


def _tree_at_set(tree, idx, values, capacity):
    """scatter values[i] -> leaf[idx[i]] with drop-on-sentinel (idx == C)."""
    return jax.tree.map(
        lambda leaf, val: leaf.at[jnp.minimum(idx, capacity)].set(
            val, mode="drop"
        )
        if leaf.ndim
        else leaf,
        tree,
        values,
    )


def _zero_moments_at(moments, slot_idx):
    """Zero Adam moments at (re)allocated slots, like the zero-filled
    exp_avg blocks in cat_tensors_to_optimizer (gaussian_model.py:268-301)."""
    def zero(leaf):
        if leaf.ndim == 0:
            return leaf
        return leaf.at[slot_idx].set(
            jnp.zeros((slot_idx.shape[0],) + leaf.shape[1:], leaf.dtype),
            mode="drop",
        )

    return jax.tree.map(zero, moments)


def _kill_slots(scene: GaussianScene, kill: jnp.ndarray) -> GaussianScene:
    """Clear alive bits; park dead params at inert defaults."""
    keep = ~kill
    return scene._replace(
        alive=scene.alive & keep,
        opacity_logits=jnp.where(kill[:, None], -10.0, scene.opacity_logits),
    )


def densify_and_prune(
    scene: GaussianScene,
    moments,
    ds: DensifyState,
    key: jax.Array,
    *,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float | None,
    percent_dense: float = 0.01,
    split_n: int = 2,
):
    """One clone+split+prune pass (gaussian_model.py:399-413).

    `moments` is any pytree whose leaves lead with the capacity axis
    (e.g. {"mu": params_like, "nu": params_like}); moments of slots that
    get (re)allocated or killed are zeroed.
    Returns (scene, moments, densify_state, info).
    """
    c = scene.capacity
    arange = jnp.arange(c, dtype=jnp.int32)
    alive = scene.alive
    scales = scene.scales
    max_scale = jnp.max(scales, axis=-1)

    grads = jnp.where(ds.denom > 0, ds.grad_accum / jnp.maximum(ds.denom, 1.0), 0.0)
    grad_hit = alive & (grads >= max_grad)
    clone_mask = grad_hit & (max_scale <= percent_dense * extent)
    split_mask = grad_hit & (max_scale > percent_dense * extent)

    # ---- children (reference order: clones, then split pairs) ---------
    reps = 1 + split_n
    parent = jnp.tile(arange, reps)  # [reps*C]
    valid = jnp.concatenate([clone_mask] + [split_mask] * split_n)
    is_split = jnp.concatenate(
        [jnp.zeros((c,), bool)] + [jnp.ones((c,), bool)] * split_n
    )

    # split sample offsets: R @ (eps * scale) per child (gaussian_model.py:367-372)
    eps = jax.random.normal(key, (split_n * c, 3)) * jnp.tile(scales, (split_n, 1))
    rot = quat_to_rotmat(scene.rotations)  # [C,3,3]
    offsets = jnp.einsum(
        "nij,nj->ni", jnp.tile(rot, (split_n, 1, 1)), eps
    )  # [split_n*C, 3]
    offsets = jnp.concatenate([jnp.zeros((c, 3), jnp.float32), offsets])

    params = scene.params()
    child_params = jax.tree.map(lambda p: p[parent], params)
    child_params["means"] = child_params["means"] + offsets
    split_log_scales = child_params["log_scales"] - jnp.log(0.8 * split_n)
    child_params["log_scales"] = jnp.where(
        is_split[:, None], split_log_scales, child_params["log_scales"]
    )

    # ---- slot allocation ---------------------------------------------
    free_mask = (~alive) | split_mask  # split parents die this pass
    num_free = jnp.sum(free_mask.astype(jnp.int32))
    free_slots = jnp.nonzero(free_mask, size=c, fill_value=c)[0].astype(jnp.int32)
    child_rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
    child_ok = valid & (child_rank < num_free)
    slot = jnp.where(
        child_ok, free_slots[jnp.clip(child_rank, 0, c - 1)], c
    ).astype(jnp.int32)

    new_params = _tree_at_set(params, slot, child_params, c)
    new_alive = (alive & ~split_mask).at[jnp.minimum(slot, c)].set(
        jnp.ones_like(slot, dtype=bool), mode="drop"
    )
    scene = scene.replace_params(new_params)._replace(alive=new_alive)
    moments = _zero_moments_at(moments, slot)

    # ---- prune on the post-densify scene (radii stats just reset) -----
    opacity = scene.opacities[:, 0]
    prune = scene.alive & (opacity < min_opacity)
    if max_screen_size is not None:
        post_reset_radii = jnp.zeros((c,), jnp.float32)  # postfix quirk
        prune = prune | (
            scene.alive
            & (
                (post_reset_radii > max_screen_size)
                | (jnp.max(scene.scales, axis=-1) > 0.1 * extent)
            )
        )
    scene = _kill_slots(scene, prune)
    moments = _zero_moments_at(
        moments, jnp.where(prune, arange, c).astype(jnp.int32)
    )

    info = DensifyInfo(
        n_cloned=jnp.sum((child_ok & ~is_split).astype(jnp.int32)),
        n_split=jnp.sum(split_mask.astype(jnp.int32)),
        n_pruned=jnp.sum(prune.astype(jnp.int32)),
        n_dropped=jnp.sum((valid & ~child_ok).astype(jnp.int32)),
        n_alive=scene.num_alive,
    )
    return scene, moments, init_densify_state(c), info


def prune_only(
    scene: GaussianScene,
    moments,
    ds: DensifyState,
    *,
    min_opacity: float = 0.005,
    size_thresh: float = 0.008,
):
    """Floater-removal phase (gaussian_model.py:426-432; schedule
    GaussianDreamer.py:398-408). Survivors keep their gradient stats.
    Returns (scene, moments, densify_state, info)."""
    c = scene.capacity
    opacity = scene.opacities[:, 0]
    prune = scene.alive & (
        (opacity < min_opacity) | (jnp.max(scene.scales, axis=-1) > size_thresh)
    )
    scene = _kill_slots(scene, prune)
    idx = jnp.where(prune, jnp.arange(c, dtype=jnp.int32), c)
    moments = _zero_moments_at(moments, idx)
    keepf = (~prune).astype(jnp.float32)
    ds = DensifyState(
        grad_accum=ds.grad_accum * keepf,
        denom=ds.denom * keepf,
        max_radii2d=ds.max_radii2d * keepf,
    )
    info = DensifyInfo(
        n_cloned=jnp.zeros((), jnp.int32),
        n_split=jnp.zeros((), jnp.int32),
        n_pruned=jnp.sum(prune.astype(jnp.int32)),
        n_dropped=jnp.zeros((), jnp.int32),
        n_alive=scene.num_alive,
    )
    return scene, moments, ds, info
