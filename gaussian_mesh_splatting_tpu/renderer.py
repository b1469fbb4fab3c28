"""Renderer layer: bag + camera -> image, the equivalent of the reference's
`renderer/` wrappers (renderer/gaussian_renderer/__init__.py:25-111).

One function serves all model variants because derivation happens in the
model layer (`to_bag`); the animated renderers of the reference
(gaussian_animated_renderer, gaussian_points_animated_renderer,
flame_gaussian_renderer) correspond to calling `to_bag` with overridden
triangles/vertices before rendering.
"""
from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp

from .core.camera import Camera
from .models.gaussian_bag import GaussianBag
from .ops.rasterize_reference import RenderOutput, rasterize_reference

Backend = Literal["reference", "pallas", "auto"]


def render(
    bag: GaussianBag,
    cam: Camera,
    bg: jax.Array,
    *,
    sh_degree: int = 3,
    scale_modifier: float = 1.0,
    antialiasing: bool = False,
    backend: Backend = "auto",
    mean2d_offset: jax.Array | None = None,
    **backend_kwargs,
) -> RenderOutput:
    """Render a GaussianBag through one camera.

    `mean2d_offset`: optional zeros (N,2); pass and differentiate w.r.t. it
    to obtain screen-space positional gradients for densification.
    `backend_kwargs` forward to the selected rasterizer (e.g.
    `pair_capacity=`, `chunk=` for pallas, `tile_size=` for reference).
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "reference"
    if backend == "pallas":
        from .ops.rasterize_pallas import rasterize_pallas

        return rasterize_pallas(
            bag.xyz,
            bag.scaling,
            bag.rotation,
            bag.opacity,
            cam,
            bg=bg,
            shs=bag.shs,
            sh_degree=sh_degree,
            scale_modifier=scale_modifier,
            antialiasing=antialiasing,
            mean2d_offset=mean2d_offset,
            alive=bag.alive,
            **backend_kwargs,
        )
    return rasterize_reference(
        bag.xyz,
        bag.scaling,
        bag.rotation,
        bag.opacity,
        cam,
        bg=bg,
        shs=bag.shs,
        sh_degree=sh_degree,
        scale_modifier=scale_modifier,
        antialiasing=antialiasing,
        mean2d_offset=mean2d_offset,
        alive=bag.alive,
        **backend_kwargs,
    )
