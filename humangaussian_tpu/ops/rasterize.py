"""Production rasterizer entry point.

For now this delegates to the exact oracle; the tile-binned Pallas path
lands in ops/binning.py + ops/rasterize_tiled.py and will be wired here
behind the same signature.
"""
from humangaussian_tpu.ops.rasterize_ref import rasterize_reference


def rasterize(*args, **kwargs):
    return rasterize_reference(*args, **kwargs)
