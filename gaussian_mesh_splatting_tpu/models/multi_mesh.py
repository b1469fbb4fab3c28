"""`gs_multi_mesh`: the gs_mesh parameterization replicated per mesh
(reference games/multi_mesh_splatting/scene/gaussian_multi_mesh_model.py).

Per-mesh trainables are held as pytree *lists* (vertices[i] (V_i,3),
alpha[i] (F_i,S_i,3), scale[i] (N_i,1)) while appearance params are single
concatenated tensors over the total Gaussian count, exactly mirroring the
reference's optimizer grouping (gaussian_multi_mesh_model.py:201-216).
`to_bag` concatenates the per-mesh derived attributes in mesh order
(gaussian_multi_mesh_model.py:99-174).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.face_frames import face_scaling_rotation_quat
from ..core.sh import rgb_to_sh
from ..core.transforms import inverse_sigmoid
from .gaussian_bag import GaussianBag, features_to_shs
from .mesh import ALPHA_EPS, EPS_S0, normalized_alpha


def init_from_meshes(
    vertices_list: list[jax.Array],
    faces_list: list[jax.Array],
    alpha_list: list[jax.Array],
    colors: jax.Array,
    sh_degree: int = 3,
) -> dict:
    """Args mirror `mesh.init_from_mesh` but per-mesh; `colors` covers the
    concatenated splats of all meshes in order."""
    counts = [a.shape[0] * a.shape[1] for a in alpha_list]
    n = sum(counts)
    assert colors.shape[0] == n
    k = (sh_degree + 1) ** 2
    params = {
        "vertices": [v.astype(jnp.float32) for v in vertices_list],
        "alpha": [a.astype(jnp.float32) for a in alpha_list],
        "scale": [jnp.ones((c, 1), jnp.float32) for c in counts],
        "f_dc": rgb_to_sh(colors)[:, None, :].astype(jnp.float32),
        "f_rest": jnp.zeros((n, k - 1, 3), jnp.float32),
        "opacity": inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32)),
    }
    consts = {"faces": [f.astype(jnp.int32) for f in faces_list]}
    return {"params": params, "consts": consts, "alive": jnp.ones((n,), bool)}


def to_bag(state: dict, triangles_list: list[jax.Array] | None = None) -> GaussianBag:
    p = state["params"]
    faces_list = state["consts"]["faces"]
    xyzs, scalings, rotations = [], [], []
    for i, (alpha_raw, faces) in enumerate(zip(p["alpha"], faces_list)):
        if triangles_list is None:
            triangles = p["vertices"][i][faces]
        else:
            triangles = triangles_list[i]
        alpha = normalized_alpha(alpha_raw)
        f, s, _ = alpha.shape
        n_i = f * s
        xyzs.append(jnp.einsum("fsa,fad->fsd", alpha, triangles).reshape(n_i, 3))
        face_scales, face_quats = face_scaling_rotation_quat(triangles, EPS_S0)
        scales_b = jnp.broadcast_to(face_scales[:, None, :], (f, s, 3)).reshape(n_i, 3)
        scalings.append(jax.nn.relu(p["scale"][i] * scales_b) + EPS_S0)
        rotations.append(jnp.broadcast_to(face_quats[:, None, :], (f, s, 4)).reshape(n_i, 4))

    return GaussianBag(
        xyz=jnp.concatenate(xyzs, axis=0),
        scaling=jnp.concatenate(scalings, axis=0),
        rotation=jnp.concatenate(rotations, axis=0),
        opacity=jax.nn.sigmoid(p["opacity"]),
        shs=features_to_shs(p["f_dc"], p["f_rest"]),
        alive=state["alive"],
    )
