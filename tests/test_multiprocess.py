"""Two-process jax.distributed training smoke (VERDICT r2 #4).

dist.multihost_init had never executed as more than one process. This
launches TWO real OS processes, each with 4 emulated CPU devices, joined
by jax.distributed over a local coordinator, and drives the camera-DP
train step over the global 8-device mesh — the same collective layout a
2-host TPU slice would use (SURVEY.md §5.8). Asserts both processes see
the global topology and agree bit-for-bit on the replicated loss.
"""
import os
import re
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(900)
def test_two_process_dp_train_step():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "dist_worker.py")
    env_base = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = []
    for pid in range(2):
        env = dict(
            env_base,
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, worker],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=840)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    results = {}
    for pid, out in enumerate(outs):
        m = re.search(
            r"RESULT process=(\d+) nproc=(\d+) ndev=(\d+) "
            r"loss=([-\d.naninf]+) step=(\d+)",
            out,
        )
        assert m, f"no RESULT line from worker {pid}:\n{out[-4000:]}"
        assert int(m.group(2)) == 2
        assert int(m.group(3)) == 8
        assert int(m.group(5)) == 2
        results[int(m.group(1))] = float(m.group(4))

    assert set(results) == {0, 1}
    import math

    assert math.isfinite(results[0])
    # replicated psum'd loss must agree exactly across processes
    assert results[0] == results[1], results
