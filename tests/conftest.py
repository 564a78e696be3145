"""Test configuration: force an 8-device CPU mesh before JAX initializes.

Tests must be deterministic, run without TPU access, and exercise the
multi-chip sharding paths — so we emulate 8 devices on CPU.
"""
import os

# hard override: the driver environment pre-sets JAX_PLATFORMS=axon,cpu
# (TPU tunnel); tests must be deterministic and offline-safe on CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
