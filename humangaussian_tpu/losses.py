"""Photometric losses & metrics: L1, L2, SSIM (11x11 Gaussian), PSNR.

JAX ports of /root/reference/gaussiansplatting/utils/loss_utils.py:17-61
and image_utils.py:15-19, used by the vanilla photo-supervised 3DGS
trainer (train.py:88-90) and its PSNR/SSIM eval (metrics.py).
Images are [H,W,C] or [B,H,W,C] float in [0,1] (NHWC, TPU-native).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def psnr(pred, target):
    """Per-batch-mean PSNR (image_utils.py:15-19)."""
    mse = jnp.mean((pred - target) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs**2) / (2.0 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5):
    """Mean SSIM with the reference's 11x11 sigma-1.5 Gaussian window and
    SAME padding (loss_utils.py:23-61)."""
    if img1.ndim == 3:
        img1 = img1[None]
        img2 = img2[None]
    win = jnp.asarray(_gaussian_window(window_size, sigma))
    c = img1.shape[-1]
    # depthwise conv: [H,W,I=1,O=C] kernel with feature_group_count=C
    kernel = jnp.tile(win[:, :, None, None], (1, 1, 1, c))

    def blur(x):
        return jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    mu1, mu2 = blur(img1), blur(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = blur(img1 * img1) - mu1_sq
    sigma2_sq = blur(img2 * img2) - mu2_sq
    sigma12 = blur(img1 * img2) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)


def photometric_loss(pred, target, lambda_dssim: float = 0.2):
    """(1-l)*L1 + l*(1-SSIM), the vanilla 3DGS objective (train.py:88-90)."""
    return (1.0 - lambda_dssim) * l1_loss(pred, target) + lambda_dssim * (
        1.0 - ssim(pred, target)
    )
