"""`gs_flat`: flat-disk Gaussians — 2-column scaling with a frozen eps
first axis (reference games/flat_splatting/scene/flat_gaussian_model.py).

Same raw params as `gs` except `scaling` is (N, 2) log-scale; the activated
scale is [eps_s0, exp(s1), exp(s2)] (flat_gaussian_model.py:32-35). The
flatness is what makes the Gaussians equivalent to textured surfels and
enables the pseudomesh (gs_points) inverse map.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.sh import rgb_to_sh
from ..core.transforms import inverse_sigmoid
from ..ops.knn import knn_scale_init
from .gaussian_bag import GaussianBag, features_to_shs

EPS_S0 = 1e-8


def init_from_points(
    points: jax.Array,
    colors: jax.Array,
    sh_degree: int = 3,
    capacity: int | None = None,
) -> dict:
    n = points.shape[0]
    k = (sh_degree + 1) ** 2
    f_dc = rgb_to_sh(colors)[:, None, :]
    f_rest = jnp.zeros((n, k - 1, 3), jnp.float32)
    scaling = jnp.tile(knn_scale_init(points)[:, None], (1, 2))  # 2 columns
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
        params["rotation"] = params["rotation"].at[n:, 0].set(1.0)
        params["scaling"] = params["scaling"].at[n:].set(-10.0)
        alive = jnp.pad(alive, (0, pad))
    return {"params": params, "alive": alive}


def to_bag(state: dict) -> GaussianBag:
    p = state["params"]
    n = p["xyz"].shape[0]
    s0 = jnp.full((n, 1), EPS_S0, jnp.float32)
    scaling = jnp.concatenate([s0, jnp.exp(p["scaling"][:, -2:])], axis=1)
    return GaussianBag(
        xyz=p["xyz"],
        scaling=scaling,
        rotation=p["rotation"] / (jnp.linalg.norm(p["rotation"], axis=-1, keepdims=True) + 1e-12),
        opacity=jax.nn.sigmoid(p["opacity"]),
        shs=features_to_shs(p["f_dc"], p["f_rest"]),
        alive=state["alive"],
    )
