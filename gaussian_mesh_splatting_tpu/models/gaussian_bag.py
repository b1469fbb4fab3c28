"""GaussianBag: the activated, render-ready Gaussian attributes.

Every model variant (`gs`, `gs_flat`, `gs_mesh`, `gs_multi_mesh`,
`gs_flame`, `gs_points`) is a pure function ``params -> GaussianBag``; the
rasterizer consumes only the bag. This replaces the reference's mutable
class hierarchy with its `get_*` activation properties and post-step
`update_alpha`/`prepare_scaling_rot` hooks (train.py:154-157): here the
derivation runs inside the loss function every step, so gradients flow
through it by construction.

`alive` is the padding mask for fixed-capacity densification buffers
(SURVEY.md §7 "padded alive-mask design"): dead rows are frustum-culled by
the rasterizer regardless of their values.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class GaussianBag:
    xyz: jax.Array  # (N, 3) world positions
    scaling: jax.Array  # (N, 3) activated (positive) scales
    rotation: jax.Array  # (N, 4) unit quaternions (w, x, y, z)
    opacity: jax.Array  # (N, 1) activated opacity in (0, 1)
    shs: jax.Array  # (N, 3, K) SH coefficients, channel-major
    alive: jax.Array  # (N,) bool padding/alive mask

    @property
    def num_gaussians(self) -> int:
        return self.xyz.shape[0]

    @property
    def sh_coeffs(self) -> int:
        return self.shs.shape[-1]


def concat_bags(bags: list[GaussianBag]) -> GaussianBag:
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *bags)


def features_to_shs(features_dc: jax.Array, features_rest: jax.Array) -> jax.Array:
    """Reference feature layout -> channel-major SH.

    features_dc (N, 1, 3) + features_rest (N, K-1, 3) -> (N, 3, K), matching
    the renderer's `shs_view` transpose (renderer/gaussian_renderer/__init__.py:83).
    """
    feats = jnp.concatenate([features_dc, features_rest], axis=1)  # (N, K, 3)
    return jnp.swapaxes(feats, 1, 2)


def shs_to_features(shs: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Inverse of `features_to_shs`."""
    feats = jnp.swapaxes(shs, 1, 2)  # (N, K, 3)
    return feats[:, :1, :], feats[:, 1:, :]
