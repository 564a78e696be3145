"""LPIPS perceptual distance (VGG16 backbone) in Flax.

Port of the reference's vendored lpipsPyTorch
(/root/reference/gaussiansplatting/lpipsPyTorch/, used by metrics.py for
the PSNR/SSIM/LPIPS eval protocol): VGG16 feature taps after
relu{1_2,2_2,3_3,4_3,5_3}, channel-unit-normalized differences weighted
by learned 1x1 "lin" layers, averaged over space and summed over taps.

Weights are NOT bundled (torchvision licensing + zero-egress):
`load_lpips_params` converts a torchvision VGG16 state_dict plus the
standard lpips "lin" weights from local files. With random weights the
module still defines a valid (untrained) perceptual metric for tests.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, layers) per stage; tap after each stage
VGG_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

# ImageNet normalization as used by lpips' scaling layer
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 up to conv5_3, returning the 5 LPIPS taps."""

    @nn.compact
    def __call__(self, x):
        taps = []
        li = 0
        for ch, layers in VGG_STAGES:
            for _ in range(layers):
                x = nn.Conv(ch, (3, 3), padding=1, name=f"conv_{li}")(x)
                x = nn.relu(x)
                li += 1
            taps.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """lpips(img1, img2) for [B,H,W,3] inputs in [0,1]."""

    @nn.compact
    def __call__(self, x, y):
        vgg = VGG16Features(name="vgg")

        def prep(img):
            img = img * 2.0 - 1.0  # lpips expects [-1,1]
            return (img - _SHIFT) / _SCALE

        fx = vgg(prep(x))
        fy = vgg(prep(y))
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            w = nn.Conv(
                1, (1, 1), use_bias=False, name=f"lin_{i}",
                kernel_init=nn.initializers.ones,
            )(d)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total  # [B]


def load_lpips_params(vgg_state_dict: dict, lin_state_dict: dict | None = None):
    """torchvision VGG16 `features` state_dict (+ optional lpips lin
    weights, keys `lin{i}.model.1.weight`) -> flax params."""
    conv_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    vgg_params = {}
    for li, tid in enumerate(conv_ids):
        w = np.asarray(vgg_state_dict[f"features.{tid}.weight"])
        b = np.asarray(vgg_state_dict[f"features.{tid}.bias"])
        vgg_params[f"conv_{li}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": b,
        }
    params = {"vgg": vgg_params}
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        if lin_state_dict and key in lin_state_dict:
            w = np.asarray(lin_state_dict[key])  # [1, C, 1, 1]
            params[f"lin_{i}"] = {"kernel": np.transpose(w, (2, 3, 1, 0))}
        else:
            c = [64, 128, 256, 512, 512][i]
            params[f"lin_{i}"] = {
                "kernel": np.full((1, 1, c, 1), 1.0 / c, np.float32)
            }
    return {"params": params}


def lpips_fn(params=None):
    """Returns a callable lpips(img1, img2) -> [B]."""
    import jax

    model = LPIPS()
    if params is None:
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 32, 32, 3)),
            jnp.zeros((1, 32, 32, 3)),
        )

    def fn(a, b):
        return model.apply(params, a, b)

    return fn
