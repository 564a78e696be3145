"""NeRF capability block: the threestudio stock stack, TPU-native.

Implements the reference's registered geometry / renderer / material /
background components that the HumanGaussian config does not exercise
but the framework ships (SURVEY.md §2.8):

- implicit-volume geometry (hash-grid or frequency encoding + MLPs,
  /root/reference/threestudio/models/geometry/implicit_volume.py)
- nerf-volume-renderer (static-shape stratified ray marching replacing
  nerfacc's occupancy-grid estimator,
  /root/reference/threestudio/models/renderers/nerf_volume_renderer.py)
- solid-color / neural-environment-map backgrounds
  (/root/reference/threestudio/models/background/*)
- no-material / diffuse-with-point-light materials
  (/root/reference/threestudio/models/materials/*)
- dreamfusion-system tying them to the standalone SD guidance
  (threestudio/systems/dreamfusion.py)
"""
from humangaussian_tpu.nerf.encoding import (
    FrequencyEncoding,
    HashGridEncoding,
)
from humangaussian_tpu.nerf.geometry import ImplicitVolume, ImplicitVolumeConfig
from humangaussian_tpu.nerf.background import (
    NeuralEnvironmentMapBackground,
    SolidColorBackground,
)
from humangaussian_tpu.nerf.material import (
    DiffuseWithPointLightMaterial,
    NoMaterial,
)
from humangaussian_tpu.nerf.renderer import (
    NerfVolumeRenderer,
    RendererConfig,
)

__all__ = [
    "FrequencyEncoding",
    "HashGridEncoding",
    "ImplicitVolume",
    "ImplicitVolumeConfig",
    "SolidColorBackground",
    "NeuralEnvironmentMapBackground",
    "NoMaterial",
    "DiffuseWithPointLightMaterial",
    "NerfVolumeRenderer",
    "RendererConfig",
]
