"""Training losses: (1 - lambda) * L1 + lambda * (1 - SSIM), the reference
objective (train.py:105-107, utils/loss_utils.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.ssim import ssim


def l1_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - gt))


def l2_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    return jnp.mean((pred - gt) ** 2)


def photometric_loss(pred: jax.Array, gt: jax.Array, lambda_dssim: float = 0.2):
    """Returns (total, l1) over (H, W, 3) images."""
    l1 = l1_loss(pred, gt)
    total = (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - ssim(pred, gt))
    return total, l1


def psnr(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Matches utils/image_utils.py:14-19 (per-image MSE over all pixels)."""
    mse = jnp.mean((pred - gt) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))
