"""Model snapshots: reference-compatible PLY + npz sidecar per gs_type.

Mirrors the per-variant save_ply/load_ply pairs (scene/gaussian_model.py:
191-267, gaussian_mesh_model.py:189-225, gaussian_multi_mesh_model.py:
222-257, gaussian_flame_model.py:232-265): the PLY always carries the
*derived* Gaussian attributes (renderable by any 3DGS viewer), and GaMeS
variants add a sidecar with their parameterization state.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..models.gaussian_bag import shs_to_features
from .checkpoint import load_sidecar, save_sidecar, unflatten_sidecar
from .ply import load_gaussians_ply, save_gaussians_ply

SIDECAR_NAME = "model_params.npz"


def save_snapshot(gs_type: str, model, state: dict, dirpath: str) -> str:
    """Write point_cloud.ply (+ sidecar). Returns the ply path."""
    os.makedirs(dirpath, exist_ok=True)
    ply_path = os.path.join(dirpath, "point_cloud.ply")
    p = state["params"]
    alive = np.asarray(state["alive"])

    if gs_type in ("gs", "gs_flat"):
        save_gaussians_ply(
            ply_path,
            np.asarray(p["xyz"])[alive],
            np.asarray(p["f_dc"])[alive],
            np.asarray(p["f_rest"])[alive],
            np.asarray(p["opacity"])[alive],
            np.asarray(p["scaling"])[alive],
            np.asarray(p["rotation"])[alive],
        )
        return ply_path

    # mesh / multi-mesh / flame / points: derive renderable attributes
    bag = model.to_bag(state)
    f_dc, f_rest = shs_to_features(bag.shs)
    save_gaussians_ply(
        ply_path,
        np.asarray(bag.xyz),
        np.asarray(f_dc),
        np.asarray(f_rest),
        np.asarray(p["opacity"]),
        np.log(np.maximum(np.asarray(bag.scaling), 1e-30)),
        np.asarray(bag.rotation),
    )
    sidecar = {k: v for k, v in p.items() if k not in ("f_dc", "f_rest", "opacity")}
    save_sidecar(os.path.join(dirpath, SIDECAR_NAME), sidecar)
    return ply_path


def load_snapshot(gs_type: str, dirpath: str, sh_degree: int = 3, consts: dict | None = None) -> dict:
    """Rebuild a model state from a snapshot directory."""
    ply_path = os.path.join(dirpath, "point_cloud.ply")
    cols = load_gaussians_ply(ply_path, max_sh_degree=sh_degree)
    n = cols["xyz"].shape[0]
    params = {
        "xyz": jnp.asarray(cols["xyz"]),
        "f_dc": jnp.asarray(cols["f_dc"]),
        "f_rest": jnp.asarray(cols["f_rest"]),
        "opacity": jnp.asarray(cols["opacity"]),
        "scaling": jnp.asarray(cols["scaling"]),
        "rotation": jnp.asarray(cols["rotation"]),
    }
    if gs_type in ("gs_flat", "gs_points"):
        # flat models keep 2 scaling columns; PLY stores the padded 3
        params["scaling"] = params["scaling"][:, -2:]

    state = {"params": params, "consts": consts or {}, "alive": jnp.ones((n,), bool)}
    sidecar_path = os.path.join(dirpath, SIDECAR_NAME)
    if gs_type in ("gs_mesh", "gs_multi_mesh", "gs_flame") and os.path.exists(sidecar_path):
        extra = unflatten_sidecar(load_sidecar(sidecar_path))
        drop = {"xyz", "scaling", "rotation"}
        merged = {k: v for k, v in params.items() if k not in drop}
        for k, v in extra.items():
            if isinstance(v, list):
                merged[k] = [jnp.asarray(x) for x in v]
            else:
                merged[k] = jnp.asarray(v)
        state["params"] = merged
    return state
