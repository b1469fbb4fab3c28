"""`gs_flame`: Gaussians bound to a FLAME head mesh
(reference games/flame_splatting/scene/gaussian_flame_model.py).

Differences from gs_mesh (gaussian_flame_model.py:176-207):
  * vertices come from the FLAME decoder each step, driven by trainable
    shape/expression/pose/neck/translation params plus a per-vertex
    enlargement factor (init 8.35, FLAME/config.py:28);
  * alpha uses softmax over the barycentric axis (not relu-normalize).

Because the rig (blendshape bases etc.) is large static data, the model is
an *instance* (`FlameGaussianModel(rig)`) exposing the same `to_bag`
interface as the other registry modules; rig arrays are closure constants
in the jitted step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.face_frames import face_scaling_rotation_quat
from ..core.sh import rgb_to_sh
from ..core.transforms import inverse_sigmoid
from .flame.decoder import FlameRig, flame_forward, transform_flame_vertices
from .gaussian_bag import GaussianBag, features_to_shs
from .mesh import EPS_S0


class FlameGaussianModel:
    def __init__(self, rig: FlameRig, shape_dim: int = 100, expr_dim: int = 50):
        self.rig = rig
        self.shape_dim = shape_dim
        self.expr_dim = expr_dim

    def init_from_flame(
        self,
        alpha: jax.Array,  # (F, S, 3) raw
        colors: jax.Array,  # (F*S, 3)
        sh_degree: int = 3,
        vertices_enlargement_init: float = 8.35,
    ) -> dict:
        f, s, _ = alpha.shape
        n = f * s
        k = (sh_degree + 1) ** 2
        n_verts = self.rig.lbs_model.v_template.shape[0]
        params = {
            "flame_shape": jnp.zeros((1, self.shape_dim), jnp.float32),
            "flame_exp": jnp.zeros((1, self.expr_dim), jnp.float32),
            "flame_pose": jnp.zeros((1, 6), jnp.float32),
            "flame_neck_pose": jnp.zeros((1, 3), jnp.float32),
            "flame_trans": jnp.zeros((1, 3), jnp.float32),
            "vertices_enlargement": jnp.full(
                (n_verts, 3), vertices_enlargement_init, jnp.float32
            ),
            "alpha": alpha.astype(jnp.float32),
            "scale": jnp.ones((n, 1), jnp.float32),
            "f_dc": rgb_to_sh(colors)[:, None, :].astype(jnp.float32),
            "f_rest": jnp.zeros((n, k - 1, 3), jnp.float32),
            "opacity": inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32)),
        }
        consts = {"faces": self.rig.lbs_model.faces}
        return {"params": params, "consts": consts, "alive": jnp.ones((n,), bool)}

    def decode_vertices(self, params: dict) -> jax.Array:
        """FLAME forward + scene transform -> (V, 3)."""
        vertices, _ = flame_forward(
            self.rig,
            params["flame_shape"],
            params["flame_exp"],
            params["flame_pose"],
            params["flame_neck_pose"],
            transl=params["flame_trans"],
        )
        return transform_flame_vertices(vertices, params["vertices_enlargement"])

    def to_bag(self, state: dict, vertices: jax.Array | None = None) -> GaussianBag:
        """`vertices` overrides the decoder output (the flame_render
        animation hook, renderer/flame_gaussian_renderer/__init__.py:59-65)."""
        p = state["params"]
        faces = state["consts"]["faces"]
        if vertices is None:
            vertices = self.decode_vertices(p)
        triangles = vertices[faces]
        alpha = jax.nn.softmax(p["alpha"], axis=2)  # (F, S, 3)
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
