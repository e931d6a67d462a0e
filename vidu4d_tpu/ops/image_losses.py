"""Image reconstruction losses / metrics: L1, PSNR, SSIM.

SSIM follows the reference exactly (`gs/utils/loss_utils.py`): 11x11 gaussian
window with sigma 1.5, per-channel depthwise convolution, C1/C2 for dynamic
range 1. Implemented with `lax.conv_general_dilated` feature-group convs,
which XLA lowers to MXU convolutions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((pred - target) ** 2)


def psnr(pred: jax.Array, target: jax.Array) -> jax.Array:
    """PSNR per the reference `gs/utils/image_utils.py`: range [0, 1]."""
    err = jnp.mean((pred - target) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(err, 1e-12)))


def _gaussian_window(window_size: int, sigma: float) -> jax.Array:
    x = jnp.arange(window_size, dtype=jnp.float32) - window_size // 2
    g = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)  # (win, win)


def _depthwise_filter(img: jax.Array, window: jax.Array) -> jax.Array:
    """img: (C, H, W), window: (win, win); 'same' depthwise conv per channel."""
    c = img.shape[0]
    kernel = jnp.broadcast_to(window[None, None], (c, 1) + window.shape)
    return jax.lax.conv_general_dilated(
        img[None],
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0]


@functools.partial(jax.jit, static_argnames=("window_size",))
def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11) -> jax.Array:
    """Mean SSIM over a (C, H, W) image pair in [0, 1]."""
    window = _gaussian_window(window_size, 1.5)
    mu1 = _depthwise_filter(img1, window)
    mu2 = _depthwise_filter(img2, window)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _depthwise_filter(img1 * img1, window) - mu1_sq
    sigma2_sq = _depthwise_filter(img2 * img2, window) - mu2_sq
    sigma12 = _depthwise_filter(img1 * img2, window) - mu1_mu2

    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)


def dssim_l1_loss(pred: jax.Array, target: jax.Array, lambda_dssim: float = 0.2) -> jax.Array:
    """The standard 3DGS photometric loss: (1-λ)·L1 + λ·(1−SSIM)."""
    return (1.0 - lambda_dssim) * l1_loss(pred, target) + lambda_dssim * (
        1.0 - ssim(pred, target)
    )
