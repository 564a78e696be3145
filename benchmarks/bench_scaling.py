"""Multi-chip scaling benchmark: camera-DP train step at 1..N devices.

Measures steps/s of dist.make_dp_train_step over growing mesh sizes and
reports scaling efficiency vs the 1-device rate (BASELINE.json target:
>= 85%). On the CPU-emulated mesh this validates the HARNESS (collective
layout, lock-step updates); real efficiency numbers require a multi-chip
slice (run the same script there).

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python benchmarks/bench_scaling.py [--batch 8] [--iters 10]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--capacity", type=int, default=4096)
    args = parser.parse_args()

    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    # the sitecustomize force-registers the axon TPU backend and
    # overrides jax_platforms at import time; the env var alone is not
    # enough (same dance as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from humangaussian_tpu.dist.parallel import make_dp_train_step, make_mesh
    from humangaussian_tpu.testing import tiny_system

    n_dev = len(jax.devices())
    system = tiny_system(capacity=args.capacity, batch=args.batch)
    state0 = system.init_state(jax.random.PRNGKey(0))

    results = {}
    sizes = [n for n in (1, 2, 4, 8, 16) if n <= n_dev and args.batch % n == 0]
    for n in sizes:
        step = (
            system.train_step if n == 1
            else make_dp_train_step(system, make_mesh(n))
        )
        state, m = step(state0)
        jax.block_until_ready(m)
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            state, m = step(state)
            jax.block_until_ready(m)
            times.append(time.perf_counter() - t0)
        results[n] = float(np.median(times))
        print(f"mesh={n}: {results[n]*1e3:.1f} ms/step", flush=True)

    base = results[sizes[0]]
    efficiency = {
        n: round(base / (results[n]), 3) for n in sizes
    }  # fixed global batch: ideal = flat step time
    print(
        json.dumps(
            {
                "metric": "dp_scaling_step_time_ratio",
                "value": efficiency[sizes[-1]],
                "unit": "x (t_1dev / t_Ndev, fixed global batch)",
                "vs_baseline": round(efficiency[sizes[-1]] / sizes[-1], 3),
                "per_mesh_ms": {n: round(results[n] * 1e3, 1) for n in sizes},
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
