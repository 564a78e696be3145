"""Pinned single-device worker for the contention-controlled DP scaling
measurement (benchmarks/bench_scaling_mp.py). Modes:

  solo: batch-b/N train step on one device, one pinned core, no mesh.
  dp:   the same per-process compute as one member of an N-process
        jax.distributed camera-DP mesh (gloo collectives).

Each process is pinned to ONE core (sched_setaffinity) with XLA:CPU
intra-op threading disabled, so N processes use N distinct cores — the
core-oversubscription confound of the single-process 8-virtual-device
proxy is gone, and t_dp/t_solo isolates true DP overhead (collectives +
replicated stages).
"""
import os
import sys
import time

MODE = os.environ["SCALE_MODE"]  # solo | dp
CORE = int(os.environ["SCALE_CORE"])
BATCH = int(os.environ["SCALE_BATCH"])  # per-process camera count
ITERS = int(os.environ.get("SCALE_ITERS", "6"))

os.sched_setaffinity(0, {CORE})
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["OMP_NUM_THREADS"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=1"
    " --xla_cpu_multi_thread_eigen=false intra_op_parallelism_threads=1"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import numpy as np  # noqa: E402
import time  # noqa: E402


def main():
    nproc = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if MODE == "psum":
        # bare collective cost at the DP step's gradient volume: the
        # CPU-proxy transport (gloo over TCP loopback) pays a fixed
        # per-step latency that real TPU ICI does not
        from jax.experimental.shard_map import shard_map
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from humangaussian_tpu.dist.parallel import multihost_init

        multihost_init()
        mesh = Mesh(np.array(jax.devices()), ("dp",))
        x = jax.device_put(
            jax.numpy.ones((BATCH * 128, 1024), jax.numpy.float32),
            NamedSharding(mesh, P()))

        @jax.jit
        def allred(v):
            return shard_map(
                lambda a: jax.lax.psum(a, "dp"), mesh=mesh,
                in_specs=P(), out_specs=P(), check_rep=False)(v)

        y = allred(x)
        float(y[0, 0])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            y = allred(y * (1.0 / nproc))
        float(y[0, 0])
        dt = (time.perf_counter() - t0) / ITERS
        print(f"RESULT mode=psum core={CORE} per_proc_batch={BATCH} "
              f"nproc={nproc} step_s={dt:.4f} loss=0", flush=True)
        return
    if MODE == "dp":
        from humangaussian_tpu.dist.parallel import (
            make_dp_train_step,
            make_mesh,
            multihost_init,
        )

        multihost_init()
        assert jax.process_count() == nproc
    from jax.sharding import NamedSharding, PartitionSpec as P

    from humangaussian_tpu.testing import tiny_system

    system = tiny_system(batch=BATCH * (nproc if MODE == "dp" else 1))
    state = system.init_state(jax.random.PRNGKey(7))

    if MODE == "dp":
        from humangaussian_tpu.dist.parallel import make_mesh

        mesh = make_mesh()
        rep = NamedSharding(mesh, P())
        state = jax.device_put(state, rep)
        system.guidance = jax.device_put(system.guidance, rep)
        step_fn = make_dp_train_step(system, mesh)
    else:
        def step_fn(s):
            return system.train_step(s)

    # warmup (compile) + sync
    for _ in range(2):
        state, metrics = step_fn(state)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step_fn(state)
    loss = float(metrics["loss"])  # fetch sync
    dt = (time.perf_counter() - t0) / ITERS
    print(f"RESULT mode={MODE} core={CORE} per_proc_batch={BATCH} "
          f"nproc={nproc} step_s={dt:.4f} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
