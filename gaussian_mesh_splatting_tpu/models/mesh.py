"""`gs_mesh`: GaMeS mesh-face Gaussian parameterization
(reference games/mesh_splatting/scene/gaussian_mesh_model.py).

Every Gaussian lives on a mesh face:

  * center = alpha-combination of the face's 3 vertices, with
    alpha = normalize(relu(raw_alpha) + 1e-8) per splat
    (gaussian_mesh_model.py:86-101, 153-169);
  * scale = relu(per-splat scalar * face extents) + eps where the face
    extents are [eps, |centroid->v1|/2, <v2_init, v2>/2]
    (gaussian_mesh_model.py:103-147);
  * rotation = face frame (normal, v1, v2) as a quaternion
    (gaussian_mesh_model.py:148-151).

Because xyz/scaling/rotation are *derived* inside `to_bag`, deforming the
mesh (pass `triangles=` — the animation path of
renderer/gaussian_animated_renderer/__init__.py:61-73) deforms the radiance
field with gradients intact; there is no post-step hook.

Trainable params: vertices (V,3), alpha (F,S,3), scale (N,1), f_dc, f_rest,
opacity — mirroring the reference optimizer groups
(gaussian_mesh_model.py:174-181). Faces are a non-trainable constant.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.face_frames import face_scaling_rotation_quat
from ..core.sh import rgb_to_sh
from ..core.transforms import inverse_sigmoid
from .gaussian_bag import GaussianBag, features_to_shs

EPS_S0 = 1e-8
ALPHA_EPS = 1e-8


def init_from_mesh(
    vertices: jax.Array,
    faces: jax.Array,
    alpha: jax.Array,
    colors: jax.Array,
    sh_degree: int = 3,
) -> dict:
    """Build raw params from a mesh + per-splat barycentric seeds.

    Args:
      vertices: (V, 3) float; already axis-transformed to scene space.
      faces: (F, 3) int vertex indices.
      alpha: (F, S, 3) raw (pre-relu-normalize) barycentric weights, e.g.
        uniform random like the reference reader
        (games/mesh_splatting/scene/dataset_readers.py:73-83).
      colors: (F*S, 3) RGB in [0,1] for SH DC init.
    """
    f, s, _ = alpha.shape
    n = f * s
    k = (sh_degree + 1) ** 2
    params = {
        "vertices": vertices.astype(jnp.float32),
        "alpha": alpha.astype(jnp.float32),
        "scale": jnp.ones((n, 1), jnp.float32),
        "f_dc": rgb_to_sh(colors)[:, None, :].astype(jnp.float32),
        "f_rest": jnp.zeros((n, k - 1, 3), jnp.float32),
        "opacity": inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32)),
    }
    consts = {"faces": faces.astype(jnp.int32)}
    return {"params": params, "consts": consts, "alive": jnp.ones((n,), bool)}


def normalized_alpha(raw_alpha: jax.Array) -> jax.Array:
    """relu + eps, normalized over the barycentric axis
    (gaussian_mesh_model.py:166-167)."""
    a = jax.nn.relu(raw_alpha) + ALPHA_EPS
    return a / jnp.sum(a, axis=-1, keepdims=True)


def to_bag(state: dict, triangles: jax.Array | None = None) -> GaussianBag:
    """Derive render-ready Gaussians.

    Args:
      triangles: optional (F, 3, 3) override of `vertices[faces]` — the
        mesh-animation hook. When given, vertices are ignored.
    """
    p = state["params"]
    faces = state["consts"]["faces"]
    if triangles is None:
        triangles = p["vertices"][faces]  # (F, 3, 3)
    alpha = normalized_alpha(p["alpha"])  # (F, S, 3)
    f, s, _ = alpha.shape
    n = f * s

    xyz = jnp.einsum("fsa,fad->fsd", alpha, triangles).reshape(n, 3)

    face_scales, face_quats = face_scaling_rotation_quat(triangles, EPS_S0)
    scales_b = jnp.broadcast_to(face_scales[:, None, :], (f, s, 3)).reshape(n, 3)
    scaling = jax.nn.relu(p["scale"] * scales_b) + EPS_S0
    rotation = jnp.broadcast_to(face_quats[:, None, :], (f, s, 4)).reshape(n, 4)

    return GaussianBag(
        xyz=xyz,
        scaling=scaling,
        rotation=rotation,
        opacity=jax.nn.sigmoid(p["opacity"]),
        shs=features_to_shs(p["f_dc"], p["f_rest"]),
        alive=state["alive"],
    )
