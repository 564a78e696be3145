"""Component registry: name -> constructor, as the reference's
threestudio.register/find (/root/reference/threestudio/__init__.py:1-13).

Lets configs select implementations by string (`system_type:
"gaussiandreamer-system"`); the stock names below mirror the reference's
registry entries that this framework implements.
"""
from __future__ import annotations

from typing import Callable

_REGISTRY: dict[str, Callable] = {}


def register(name: str):
    def decorator(cls):
        if name in _REGISTRY and _REGISTRY[name] is not cls:
            raise ValueError(f"duplicate registry name {name!r}")
        _REGISTRY[name] = cls
        return cls

    return decorator


def find(name: str) -> Callable:
    if name not in _REGISTRY:
        # populate lazily so importing the registry stays cheap
        _register_builtins()
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown component {name!r}; known: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def names() -> list[str]:
    _register_builtins()
    return sorted(_REGISTRY)


_BUILTINS_DONE = False


def _register_builtins():
    global _BUILTINS_DONE
    if _BUILTINS_DONE:
        return
    _BUILTINS_DONE = True
    from humangaussian_tpu.data.cameras import RandomCameraConfig
    from humangaussian_tpu.guidance.dual_branch import DualBranchGuidance
    from humangaussian_tpu.guidance.prompt import PromptProcessor
    from humangaussian_tpu.train.photo import PhotoTrainer
    from humangaussian_tpu.train.system import GaussianDreamerSystem

    from humangaussian_tpu.guidance.stable_diffusion import (
        StableDiffusionGuidance,
    )

    _REGISTRY.setdefault("gaussiandreamer-system", GaussianDreamerSystem)
    _REGISTRY.setdefault("dual-branch-guidance", DualBranchGuidance)
    _REGISTRY.setdefault("stable-diffusion-guidance", StableDiffusionGuidance)

    from humangaussian_tpu.guidance.deep_floyd import DeepFloydGuidance

    _REGISTRY.setdefault("deep-floyd-guidance", DeepFloydGuidance)
    _REGISTRY.setdefault("deep-floyd-prompt-processor", PromptProcessor)
    _REGISTRY.setdefault(
        "texture-structure-prompt-processor", PromptProcessor
    )
    _REGISTRY.setdefault("stable-diffusion-prompt-processor", PromptProcessor)
    _REGISTRY.setdefault("random-camera-datamodule", RandomCameraConfig)
    _REGISTRY.setdefault("photo-3dgs-trainer", PhotoTrainer)

    from humangaussian_tpu.data.co3d import Co3dDataModule
    from humangaussian_tpu.data.image import SingleImageDataModule
    from humangaussian_tpu.data.multiview import MultiviewDataModule

    _REGISTRY.setdefault("co3d-datamodule", Co3dDataModule)
    _REGISTRY.setdefault("single-image-datamodule", SingleImageDataModule)
    _REGISTRY.setdefault("multiview-camera-datamodule", MultiviewDataModule)

    from humangaussian_tpu.nerf import (
        DiffuseWithPointLightMaterial,
        ImplicitVolume,
        NerfVolumeRenderer,
        NeuralEnvironmentMapBackground,
        NoMaterial,
        SolidColorBackground,
    )
    from humangaussian_tpu.nerf.system import DreamFusionSystem

    _REGISTRY.setdefault("implicit-volume", ImplicitVolume)
    _REGISTRY.setdefault("nerf-volume-renderer", NerfVolumeRenderer)
    _REGISTRY.setdefault("solid-color-background", SolidColorBackground)
    _REGISTRY.setdefault(
        "neural-environment-map-background", NeuralEnvironmentMapBackground
    )
    _REGISTRY.setdefault("no-material", NoMaterial)
    _REGISTRY.setdefault(
        "diffuse-with-point-light-material", DiffuseWithPointLightMaterial
    )
    _REGISTRY.setdefault("dreamfusion-system", DreamFusionSystem)

    from humangaussian_tpu.nerf.exporter import export_implicit_volume

    _REGISTRY.setdefault("mesh-exporter", export_implicit_volume)

    from humangaussian_tpu.nerf.sdf import (
        ImplicitSDF,
        NeusVolumeRenderer,
        VolumeGrid,
    )
    from humangaussian_tpu.nerf.material import (
        NeuralRadianceMaterial,
        PBRMaterial,
    )
    from humangaussian_tpu.nerf.background import TexturedBackground

    _REGISTRY.setdefault("implicit-sdf", ImplicitSDF)
    _REGISTRY.setdefault("volume-grid", VolumeGrid)
    _REGISTRY.setdefault("neus-volume-renderer", NeusVolumeRenderer)
    _REGISTRY.setdefault("neural-radiance-material", NeuralRadianceMaterial)
    _REGISTRY.setdefault("pbr-material", PBRMaterial)
    _REGISTRY.setdefault("textured-background", TexturedBackground)

    from humangaussian_tpu.guidance.controlnet import ControlNetGuidance
    from humangaussian_tpu.guidance.prompt import DummyPromptProcessor
    from humangaussian_tpu.nerf.explicit import (
        CustomMesh,
        NVDiffRasterizer,
        PatchRenderer,
        TetrahedraSDFGrid,
    )
    from humangaussian_tpu.nerf.material import (
        HybridRGBLatentMaterial,
        SDLatentAdapterMaterial,
    )

    _REGISTRY.setdefault("stable-diffusion-controlnet-guidance",
                         ControlNetGuidance)
    _REGISTRY.setdefault("dummy-prompt-processor", DummyPromptProcessor)
    _REGISTRY.setdefault("custom-mesh", CustomMesh)
    _REGISTRY.setdefault("tetrahedra-sdf-grid", TetrahedraSDFGrid)
    _REGISTRY.setdefault("nvdiff-rasterizer", NVDiffRasterizer)
    _REGISTRY.setdefault("patch-renderer", PatchRenderer)
    _REGISTRY.setdefault("sd-latent-adapter-material",
                         SDLatentAdapterMaterial)
    _REGISTRY.setdefault("hybrid-rgb-latent-material",
                         HybridRGBLatentMaterial)

    from humangaussian_tpu.nerf.gan import GANVolumeRenderer

    _REGISTRY.setdefault("gan-volume-renderer", GANVolumeRenderer)
