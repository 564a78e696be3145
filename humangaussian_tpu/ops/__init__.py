from humangaussian_tpu.ops.projection import (
    RasterizeConfig,
    ProjectedGaussians,
    project_gaussians,
)
from humangaussian_tpu.ops.rasterize_ref import rasterize_reference
from humangaussian_tpu.ops.rasterize_tiled import rasterize_tiled
from humangaussian_tpu.ops.rasterize import rasterize
from humangaussian_tpu.ops.binning import build_tile_bins, TileBins
from humangaussian_tpu.ops.knn import mean_3nn_sq_dist, mean_3nn_sq_dist_host
from humangaussian_tpu.ops.groupnorm import GroupNormAct, group_norm_act

__all__ = [
    "RasterizeConfig",
    "ProjectedGaussians",
    "project_gaussians",
    "rasterize_reference",
    "rasterize_tiled",
    "rasterize",
    "build_tile_bins",
    "TileBins",
    "mean_3nn_sq_dist",
    "mean_3nn_sq_dist_host",
    "GroupNormAct",
    "group_norm_act",
]
