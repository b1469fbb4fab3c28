"""Windowed SSIM, matching the reference implementation
(utils/loss_utils.py:23-63): 11x11 Gaussian window (sigma=1.5), zero
('same') padding, per-channel convolution, C1=0.01^2, C2=0.03^2.

Implemented as two separable 1D convolutions (the 2D window is an outer
product of the 1D Gaussian) — fewer FLOPs and XLA fuses the elementwise
tail. Images are (H, W, C) in [0, 1].
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

C1 = 0.01**2
C2 = 0.03**2


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur(img: jax.Array, window_size: int, sigma: float) -> jax.Array:
    """Separable 'same'-padded Gaussian blur over (H, W, C)."""
    w = jnp.asarray(_gaussian_window(window_size, sigma))
    # NHWC conv with depthwise 1D kernels
    x = img[None]  # (1, H, W, C)
    c = img.shape[-1]
    kh = jnp.tile(w.reshape(window_size, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(w.reshape(1, window_size, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    pad = window_size // 2
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(pad, pad), (0, 0)], dimension_numbers=dn,
        feature_group_count=c,
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn,
        feature_group_count=c,
    )
    return x[0]


def ssim(
    img1: jax.Array,
    img2: jax.Array,
    window_size: int = 11,
    sigma: float = 1.5,
    size_average: bool = True,
) -> jax.Array:
    """SSIM over (H, W, C) images; returns scalar mean (size_average) or the
    per-channel mean map."""
    mu1 = _blur(img1, window_size, sigma)
    mu2 = _blur(img2, window_size, sigma)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _blur(img1 * img1, window_size, sigma) - mu1_sq
    sigma2_sq = _blur(img2 * img2, window_size, sigma) - mu2_sq
    sigma12 = _blur(img1 * img2, window_size, sigma) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(0, 1))
