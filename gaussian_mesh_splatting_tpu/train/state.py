"""Functional training state.

Replaces the reference's per-group torch.optim.Adam construction
(scene/gaussian_model.py:149-167, games/*/scene/*:training_setup) with an
optax `multi_transform`: each top-level param key gets its own Adam
(eps=1e-15 like the reference) at its reference learning rate; `xyz` uses
the log-linear position schedule scaled by the scene extent.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..core.lr_schedule import make_expon_lr_schedule
from .config import (
    FlameOptimizationConfig,
    MeshOptimizationConfig,
    OptimizationConfig,
)


@struct.dataclass
class DensifyStats:
    """Screen-space gradient statistics driving density control
    (scene/gaussian_model.py:416-418)."""

    grad_accum: jax.Array  # (C,) accumulated ||dL/dmean2d_ndc||
    denom: jax.Array  # (C,) number of visible observations
    max_radii: jax.Array  # (C,) max screen radius ever seen

    @classmethod
    def zeros(cls, capacity: int) -> "DensifyStats":
        z = jnp.zeros((capacity,), jnp.float32)
        return cls(grad_accum=z, denom=z, max_radii=z)


@struct.dataclass
class TrainState:
    step: jax.Array  # scalar int32
    params: Any  # trainable param pytree
    opt_state: Any
    alive: jax.Array  # (C,) bool
    consts: Any  # non-trainable constants (faces, ...)
    stats: DensifyStats
    active_sh_degree: jax.Array  # scalar int32 (capped by model's max)

    def model_state(self) -> dict:
        return {"params": self.params, "consts": self.consts, "alive": self.alive}


def _adam(lr, eps=1e-15):
    return optax.adam(learning_rate=lr, eps=eps)


def _labels_like(params: Any) -> Any:
    return {k: jax.tree.map(lambda _: k, v) for k, v in params.items()}


def make_optimizer(
    gs_type: str,
    config,
    spatial_lr_scale: float = 1.0,
) -> optax.GradientTransformation:
    """Per-group transforms keyed by top-level param name."""
    if isinstance(config, OptimizationConfig):
        # vanilla / flat (gaussian_model.py:154-167)
        xyz_schedule = make_expon_lr_schedule(
            config.position_lr_init * spatial_lr_scale,
            config.position_lr_final * spatial_lr_scale,
            lr_delay_mult=config.position_lr_delay_mult,
            max_steps=config.position_lr_max_steps,
        )
        transforms = {
            "xyz": _adam(xyz_schedule),
            "f_dc": _adam(config.feature_lr),
            "f_rest": _adam(config.feature_lr / 20.0),
            "opacity": _adam(config.opacity_lr),
            "scaling": _adam(config.scaling_lr),
            "rotation": _adam(config.rotation_lr),
        }
    elif isinstance(config, MeshOptimizationConfig):
        # gs_mesh / gs_multi_mesh (gaussian_mesh_model.py:174-183)
        transforms = {
            "vertices": _adam(config.vertices_lr),
            "alpha": _adam(config.alpha_lr),
            "f_dc": _adam(config.feature_lr),
            "f_rest": _adam(config.feature_lr / 20.0),
            "opacity": _adam(config.opacity_lr),
            "scale": _adam(config.scaling_lr),
        }
    elif isinstance(config, FlameOptimizationConfig):
        # gs_flame (gaussian_flame_model.py:209-230)
        transforms = {
            "flame_shape": _adam(config.flame_shape_lr),
            "flame_exp": _adam(config.flame_exp_lr),
            "flame_pose": _adam(config.flame_pose_lr),
            "flame_neck_pose": _adam(config.flame_neck_pose_lr),
            "flame_trans": _adam(config.flame_trans_lr),
            "vertices_enlargement": _adam(config.vertices_enlargement_lr),
            "alpha": _adam(config.alpha_lr),
            "f_dc": _adam(config.feature_lr),
            "f_rest": _adam(config.feature_lr / 20.0),
            "opacity": _adam(config.opacity_lr),
            "scale": _adam(config.scaling_lr),
        }
    else:
        raise TypeError(f"unknown config type {type(config)}")
    return optax.multi_transform(transforms, _labels_like)


def make_train_state(
    gs_type: str,
    model_state: dict,
    config,
    spatial_lr_scale: float = 1.0,
) -> tuple[TrainState, optax.GradientTransformation]:
    params = model_state["params"]
    tx = make_optimizer(gs_type, config, spatial_lr_scale)
    opt_state = tx.init(params)
    capacity = model_state["alive"].shape[0]
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        alive=model_state["alive"],
        consts=model_state.get("consts", {}),
        stats=DensifyStats.zeros(capacity),
        active_sh_degree=jnp.zeros((), jnp.int32),
    )
    return state, tx
