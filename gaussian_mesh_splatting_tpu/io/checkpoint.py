"""Training checkpoints (full-state resume) and model snapshots.

Two mechanisms, mirroring the reference (SURVEY.md §5.4):
  (a) training checkpoints: the full TrainState pytree (params + optimizer
      moments + densify stats + step) via orbax -> `chkpnt{N}` directories
      (reference: torch.save of capture(), train.py:150-152). Unlike the
      reference, GaMeS-specific params ARE included — the reference's
      missing-vertices/alpha checkpoint bug is documented as a quirk not to
      replicate (SURVEY.md §7).
  (b) model snapshots: `point_cloud/iteration_{N}/point_cloud.ply` in the
      reference-compatible layout plus a `model_params.npz` sidecar for
      params that do not fit the PLY schema (mesh alpha/vertices/FLAME),
      replacing the reference's pickle `.pt` sidecars
      (gaussian_mesh_model.py:194-209) with a safe format.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

from ..train.state import TrainState


def save_checkpoint(path: str, state: TrainState) -> None:
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), state, force=True)
    ckpt.wait_until_finished()


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(os.path.abspath(path), template)


# ---------------------------------------------------------------- snapshots

def _flatten_params(params: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    if isinstance(params, dict):
        for k, v in params.items():
            out.update(_flatten_params(v, f"{prefix}{k}/"))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            out.update(_flatten_params(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(params)
    return out


def save_sidecar(path: str, tree: Any) -> None:
    """npz sidecar for non-PLY params (keys are /-joined tree paths)."""
    flat = _flatten_params(tree)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def load_sidecar(path: str) -> dict[str, np.ndarray]:
    data = np.load(path)
    return {k: data[k] for k in data.files}


def unflatten_sidecar(flat: dict[str, np.ndarray]) -> dict:
    """Rebuild a nested dict (integer segments -> lists)."""
    root: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if isinstance(node, dict):
            keys = list(node)
            if keys and all(k.isdigit() for k in keys):
                return [listify(node[k]) for k in sorted(keys, key=int)]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(root)


def snapshot_dir(model_path: str, iteration: int) -> str:
    return os.path.join(model_path, "point_cloud", f"iteration_{iteration}")
