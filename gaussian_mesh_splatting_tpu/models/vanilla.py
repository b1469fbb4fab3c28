"""`gs`: vanilla 3DGS parameterization (reference scene/gaussian_model.py).

Raw (trainable) parameters use the reference's optimizer-group names
(gaussian_model.py:154-161) so hyperparameter tables carry over:

  xyz (N,3) | f_dc (N,1,3) | f_rest (N,K-1,3) | opacity (N,1) raw logit |
  scaling (N,3) log-scale | rotation (N,4) unnormalized quat

Activations (gaussian_model.py:26-41): exp on scaling, sigmoid on opacity,
normalize on rotation. Initialization from a point cloud matches
create_from_pcd (gaussian_model.py:124-147): SH DC from RGB, 3-NN mean
distance isotropic scale, identity rotations, opacity 0.1.

A fixed-capacity variant pads params to `capacity` rows with an alive mask
for jit-stable densification (see train/densify.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.sh import rgb_to_sh
from ..core.transforms import inverse_sigmoid
from ..ops.knn import knn_scale_init
from .gaussian_bag import GaussianBag, features_to_shs


def init_from_points(
    points: jax.Array,
    colors: jax.Array,
    sh_degree: int = 3,
    capacity: int | None = None,
) -> dict:
    """Build raw params from (N,3) points + (N,3) RGB colors in [0,1]."""
    n = points.shape[0]
    k = (sh_degree + 1) ** 2
    f_dc = rgb_to_sh(colors)[:, None, :]  # (N, 1, 3)
    f_rest = jnp.zeros((n, k - 1, 3), jnp.float32)
    scaling = jnp.tile(knn_scale_init(points)[:, None], (1, 3))
    rotation = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
    opacity = inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32))
    params = {
        "xyz": points.astype(jnp.float32),
        "f_dc": f_dc.astype(jnp.float32),
        "f_rest": f_rest,
        "opacity": opacity,
        "scaling": scaling.astype(jnp.float32),
        "rotation": rotation,
    }
    alive = jnp.ones((n,), bool)
    if capacity is not None and capacity > n:
        pad = capacity - n
        params = jax.tree.map(lambda x: jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1)), params)
        # padded rotations must stay unit-ish to avoid 0/0 in normalize
        params["rotation"] = params["rotation"].at[n:, 0].set(1.0)
        # padded scalings at exp(0)=1 would make huge ghost Gaussians if a
        # bug ever revives them; keep them tiny instead
        params["scaling"] = params["scaling"].at[n:].set(-10.0)
        alive = jnp.pad(alive, (0, pad))
    return {"params": params, "alive": alive}


def to_bag(state: dict) -> GaussianBag:
    p = state["params"]
    return GaussianBag(
        xyz=p["xyz"],
        scaling=jnp.exp(p["scaling"]),
        rotation=p["rotation"] / (jnp.linalg.norm(p["rotation"], axis=-1, keepdims=True) + 1e-12),
        opacity=jax.nn.sigmoid(p["opacity"]),
        shs=features_to_shs(p["f_dc"], p["f_rest"]),
        alive=state["alive"],
    )
