"""Test configuration: force a deterministic 8-device CPU mesh.

Tests must be reproducible, offline-safe, and exercise the multi-chip
sharding paths — so we emulate 8 devices on CPU regardless of what TPU
backends the environment registers.

The environment's sitecustomize force-registers an `axon` TPU backend and
overrides `jax_platforms` at import time, so setting JAX_PLATFORMS in the
environment is NOT sufficient; we re-override through jax.config after
import (backends initialize lazily, so this wins as long as no test ran
yet). Set HG_TEST_TPU=1 to skip the override and run tests against the
real TPU backend instead.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

if not os.environ.get("HG_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():  # a plugin touched jax.devices()
        from jax.extend.backend import clear_backends

        clear_backends()
