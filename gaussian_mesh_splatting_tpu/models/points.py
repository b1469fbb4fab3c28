"""`gs_points`: render-only pseudomesh parameterization
(reference games/flat_splatting/scene/points_gaussian_model.py).

The inverse of `gs_flat`: trained flat Gaussians are converted to a
triangle soup (one triangle per Gaussian), and scaling/rotation are
re-derived from (possibly edited/animated) triangles. This is what enables
Blender-style editing of a trained flat-splat scene
(README.md:641-677 pipeline).

State is a `gs_flat`-style param dict (typically loaded from PLY); the
triangle soup itself carries the geometry thereafter.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.face_frames import gaussians_to_pseudomesh, soup_scaling_rotation_quat
from .flat import EPS_S0
from .gaussian_bag import GaussianBag, features_to_shs


def pseudomesh_from_state(state: dict) -> jax.Array:
    """Flat-Gaussian params -> (N, 3, 3) triangle soup
    (points_gaussian_model.py:28-58)."""
    p = state["params"]
    n = p["xyz"].shape[0]
    s0 = jnp.full((n, 1), EPS_S0, jnp.float32)
    scaling = jnp.concatenate([s0, jnp.exp(p["scaling"][:, -2:])], axis=1)
    q = p["rotation"] / (jnp.linalg.norm(p["rotation"], axis=-1, keepdims=True) + 1e-12)
    return gaussians_to_pseudomesh(p["xyz"], scaling, q)


def to_bag(state: dict, triangles: jax.Array) -> GaussianBag:
    """Render Gaussians derived from a triangle soup.

    xyz = first soup vertex; scaling/rotation re-derived from the triangle
    (the per-frame animation path,
    renderer/gaussian_points_animated_renderer/__init__.py:61-66).
    """
    p = state["params"]
    n = triangles.shape[0]
    scales2, quats = soup_scaling_rotation_quat(triangles, eps=1e-8)
    scaling = jnp.concatenate([jnp.full((n, 1), EPS_S0, jnp.float32), scales2], axis=1)
    return GaussianBag(
        xyz=triangles[:, 0],
        scaling=scaling,
        rotation=quats,
        opacity=jax.nn.sigmoid(p["opacity"]),
        shs=features_to_shs(p["f_dc"], p["f_rest"]),
        alive=state["alive"],
    )
