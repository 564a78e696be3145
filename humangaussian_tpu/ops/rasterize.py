"""Production rasterizer entry point.

`rasterize()` dispatches between the tile-binned Pallas production path
(ops/rasterize_tiled.py) and the exact pure-JAX oracle
(ops/rasterize_ref.py). Both satisfy the reference render() contract
(/root/reference/gaussiansplatting/gaussian_renderer/__init__.py:98-104)
and agree to float rounding (tests/test_rasterize_tiled.py).
"""
from humangaussian_tpu.ops.rasterize_ref import rasterize_reference
from humangaussian_tpu.ops.rasterize_tiled import rasterize_tiled


def rasterize(*args, impl: str = "tiled", **kwargs):
    """Render projected Gaussians.

    impl: "tiled" (Pallas production kernels) or "reference" (oracle).
    """
    if impl == "tiled":
        return rasterize_tiled(*args, **kwargs)
    if impl == "reference":
        return rasterize_reference(*args, **kwargs)
    raise ValueError(f"unknown rasterizer impl {impl!r}")
