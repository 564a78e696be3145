"""Multi-chip training: camera-data-parallel shard_map over a Mesh.

The reference trains single-GPU (its DDP path never synchronizes
densification and is effectively unsupported — SURVEY.md §2.10). The
TPU-native design (SURVEY.md §5.7-5.8) shards the CAMERA batch across
chips, replicates the Gaussian scene, and all-reduces parameter
gradients over ICI:

  shard_map over mesh axis "data":
    per-chip: render b/n cameras (Pallas kernels run per-chip on local
              tiles) -> guidance -> local loss grads
    psum:     scene-param grads, means2d densification grads, loss
    pmax:     per-Gaussian max radii, the global depth max (the
              reference's depth normalization quirk, GaussianDreamer.py:302)

Everything after the psum (Adam, densify stats, clone/split/prune) runs
replicated — every chip computes identical updates from identical
all-reduced inputs, which keeps the padded scene bit-identical across
chips with NO further communication. That is the lock-step-densification
scheme SURVEY.md §7.2(9) calls for.

Scaling note: per-chip work is b/n full renders, so camera-DP scales to
mesh sizes up to the batch size; the tile axis within each render is an
independent Pallas grid and can later be split with a second mesh axis.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from humangaussian_tpu.densify import update_stats
from humangaussian_tpu.train.optim import adam_step
from humangaussian_tpu.train.system import TrainState


def multihost_init():
    """jax.distributed.initialize() when running under a multi-host
    launcher (no-op without JAX_COORDINATOR_ADDRESS).

    On TPU pods jax auto-detects the topology; for explicit launchers
    (incl. the two-process CPU test, tests/test_multiprocess.py) the
    process count/id come from JAX_NUM_PROCESSES / JAX_PROCESS_ID."""
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if nproc is not None and pid is not None:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(nproc),
            process_id=int(pid),
        )
    else:
        jax.distributed.initialize()


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    import numpy as np

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def make_dp_train_step(system, mesh: Mesh, axis: str = "data"):
    """Build a jitted camera-data-parallel train step for `system`.

    The returned function has the same signature/semantics as
    system.train_step (same losses, same RNG stream) — verified
    equivalent to the single-device step in tests/test_dist.py.
    """
    n = mesh.shape[axis]
    b = system.camera_cfg.batch_size
    if b % n:
        raise ValueError(f"batch {b} not divisible by mesh axis {axis}={n}")

    replicated = P()
    batch_first = P(axis)

    def sharded_grads(scene, cameras, pose, text3, t, k_guid, step, guidance,
                      active_cap=None):
        params = scene.params()
        offset = jnp.zeros((system.cfg.capacity, 2), jnp.float32)
        sample_idx = jnp.arange(b, dtype=jnp.int32)

        def shard_fn(cameras, pose, text3, t, sample_idx, guidance):
            def loss_fn(params, offset):
                return system.batch_loss(
                    params, offset, scene, cameras, pose, text3, t,
                    k_guid, step, axis_name=axis, n_shards=n, global_batch=b,
                    sample_idx=sample_idx, guidance=guidance,
                    active_cap=active_cap,
                )

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(params, offset)
            param_grads, means2d_grad = grads
            param_grads = jax.lax.psum(param_grads, axis)
            means2d_grad = jax.lax.psum(means2d_grad, axis)
            loss = jax.lax.psum(loss, axis)
            aux = {
                "radii": jax.lax.pmax(aux["radii"], axis),
                "loss_sds": jax.lax.psum(aux["loss_sds"], axis),
                "loss_sparsity": jax.lax.psum(aux["loss_sparsity"], axis),
                "loss_opaque": jax.lax.psum(aux["loss_opaque"], axis),
                "grad_norm": jax.lax.pmax(aux["grad_norm"], axis),
                "overflow": jax.lax.pmax(aux["overflow"], axis),
                "overflow_spill": jax.lax.pmax(aux["overflow_spill"], axis),
            }
            return loss, aux, param_grads, means2d_grad

        # cameras/pose/t/idx shard on the batch axis; text3 on its axis 1;
        # guidance params replicated (every chip holds the full prior)
        cam_spec = jax.tree.map(lambda _: batch_first, cameras)
        cam_spec = cam_spec._replace(is_head=replicated, is_back=replicated)
        guid_spec = jax.tree.map(lambda _: replicated, guidance)
        return shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(
                cam_spec, batch_first, P(None, axis), batch_first,
                batch_first, guid_spec,
            ),
            out_specs=(replicated, replicated, replicated, replicated),
            check_rep=False,
        )(cameras, pose, text3, t, sample_idx, guidance)

    @functools.partial(jax.jit, static_argnums=(2,))
    def _dp_train_step(state: TrainState, guidance, active_cap=None):
        cfg = system.cfg
        key, k_guid, cameras, pose, text3, t = system.sample_step_inputs(state)
        step = state.step

        loss, aux, param_grads, means2d_grad = sharded_grads(
            state.scene, cameras, pose, text3, t, k_guid, step, guidance,
            active_cap,
        )

        visible = aux["radii"] > 0
        if cfg.disable_hand_densification:
            dist = jnp.linalg.norm(
                state.scene.means[:, None, :] - system.hand_centers[None],
                axis=-1,
            )
            visible = visible & ~(jnp.min(dist, axis=-1) < cfg.hand_radius)
        densify_state = update_stats(
            state.densify, means2d_grad, aux["radii"], visible
        )

        params = state.scene.params()
        lrs = system.optim_cfg.group_lrs(step)
        new_params, adam = adam_step(
            params, param_grads, state.adam, lrs, system.optim_cfg
        )
        scene = state.scene.replace_params(new_params)
        metrics = {
            "loss": loss,
            "loss_sds": aux["loss_sds"],
            "loss_sparsity": aux["loss_sparsity"],
            "loss_opaque": aux["loss_opaque"],
            "grad_norm": aux["grad_norm"],
            "overflow": aux["overflow"],
            "overflow_spill": aux["overflow_spill"],
            "n_alive": scene.num_alive,
        }
        return (
            TrainState(
                scene=scene, adam=adam, densify=densify_state,
                step=step + 1, key=key,
            ),
            metrics,
        )

    def dp_train_step(state: TrainState, active_cap=None):
        return _dp_train_step(state, system.guidance, active_cap)

    return dp_train_step
