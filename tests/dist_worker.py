"""Worker process for the two-process jax.distributed test.

Launched by tests/test_multiprocess.py with env:
  JAX_COORDINATOR_ADDRESS=127.0.0.1:<port>
  JAX_NUM_PROCESSES=2  JAX_PROCESS_ID=<0|1>

Each process owns 4 emulated CPU devices; the global mesh is 8. Runs
dist.multihost_init -> make_dp_train_step for 2 steps and prints one
RESULT line the parent asserts on (process_count, device count, loss).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# cross-process collectives on the CPU backend
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from humangaussian_tpu.dist.parallel import (  # noqa: E402
    make_dp_train_step,
    make_mesh,
    multihost_init,
)


def main():
    multihost_init()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4, len(jax.local_devices())

    from jax.sharding import NamedSharding, PartitionSpec as P

    from humangaussian_tpu.testing import tiny_system

    system = tiny_system(batch=8)
    state = system.init_state(jax.random.PRNGKey(7))
    mesh = make_mesh()  # all 8 global devices
    # state/guidance are built identically on every process (same seed);
    # commit them as GLOBAL replicated arrays so the jitted step accepts
    # them across the non-addressable mesh
    rep = NamedSharding(mesh, P())
    state = jax.device_put(state, rep)
    system.guidance = jax.device_put(system.guidance, rep)

    dp_step = make_dp_train_step(system, mesh)
    for _ in range(2):
        state, metrics = dp_step(state)
    loss = float(metrics["loss"])
    print(
        f"RESULT process={jax.process_index()} nproc={jax.process_count()} "
        f"ndev={len(jax.devices())} loss={loss:.6f} "
        f"step={int(state.step)}",
        flush=True,
    )


if __name__ == "__main__":
    main()
