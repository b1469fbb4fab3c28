"""Camera model: pinhole projective cameras as a JAX pytree.

Matrix conventions
------------------
We store matrices in *math* (column-vector) convention: ``p' = M @ p_hom``.
The reference stores the transposes because its CUDA rasterizer consumes
glm-style row-vector matrices (scene/cameras.py:54-57); the underlying
geometry is identical. Construction semantics match the reference exactly:

  - ``R`` argument is the camera-to-world rotation (the reference stores the
    world-to-view rotation transposed, scene/dataset_readers.py:197 and
    utils/graphics_utils.py:38-49).
  - ``T`` is the world-to-view translation.
  - projection maps view-space z into [0, zfar] NDC with z_sign = +1
    (utils/graphics_utils.py:51-71) — an OpenGL-shaped frustum without the
    usual z flip.

Static image dimensions live outside the traced pytree so every distinct
resolution compiles once and everything else is dynamic.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def world_to_view(
    R: np.ndarray,
    t: np.ndarray,
    translate: np.ndarray | None = None,
    scale: float = 1.0,
) -> np.ndarray:
    """4x4 world->view matrix (column-vector convention).

    Mirrors utils/graphics_utils.py:38-49: optionally re-centers/rescales the
    camera position in world space (used for scene normalization).
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    if translate is not None or scale != 1.0:
        translate = np.zeros(3) if translate is None else np.asarray(translate)
        C2W = np.linalg.inv(Rt)
        cam_center = (C2W[:3, 3] + translate) * scale
        C2W[:3, 3] = cam_center
        Rt = np.linalg.inv(C2W)
    return Rt.astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """Perspective projection, z mapped to [0, zfar] (graphics_utils.py:51-71)."""
    tan_half_fovy = math.tan(fovy / 2)
    tan_half_fovx = math.tan(fovx / 2)
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 1.0 / tan_half_fovx
    P[1, 1] = 1.0 / tan_half_fovy
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


@struct.dataclass
class Camera:
    """A single pinhole camera; a pytree safe for jit/vmap/shard_map.

    All array fields are float32. ``width``/``height`` are static (pytree
    metadata) so image shapes stay known at trace time.
    """

    world_view: jax.Array  # (4,4) world -> view, column-vector convention
    full_proj: jax.Array  # (4,4) = proj @ world_view
    cam_center: jax.Array  # (3,) camera position in world space
    tanfovx: jax.Array  # scalar
    tanfovy: jax.Array  # scalar
    znear: jax.Array  # scalar
    zfar: jax.Array  # scalar
    width: int = struct.field(pytree_node=False, default=0)
    height: int = struct.field(pytree_node=False, default=0)

    @property
    def focal_x(self) -> jax.Array:
        return self.width / (2.0 * self.tanfovx)

    @property
    def focal_y(self) -> jax.Array:
        return self.height / (2.0 * self.tanfovy)


def make_camera(
    R: np.ndarray,
    T: np.ndarray,
    fovx: float,
    fovy: float,
    width: int,
    height: int,
    znear: float = 0.01,
    zfar: float = 100.0,
    trans: np.ndarray | None = None,
    scale: float = 1.0,
) -> Camera:
    """Build a Camera from reference-convention extrinsics (see module doc)."""
    W = world_to_view(R, T, trans, scale)
    P = projection_matrix(znear, zfar, fovx, fovy)
    full = (P @ W).astype(np.float32)
    C2W = np.linalg.inv(W.astype(np.float64))
    center = C2W[:3, 3].astype(np.float32)
    return Camera(
        world_view=jnp.asarray(W),
        full_proj=jnp.asarray(full),
        cam_center=jnp.asarray(center),
        tanfovx=jnp.asarray(math.tan(fovx / 2), jnp.float32),
        tanfovy=jnp.asarray(math.tan(fovy / 2), jnp.float32),
        znear=jnp.asarray(znear, jnp.float32),
        zfar=jnp.asarray(zfar, jnp.float32),
        width=int(width),
        height=int(height),
    )


def stack_cameras(cams: list[Camera]) -> Camera:
    """Stack same-resolution cameras into one batched Camera pytree (leading
    axis = camera). Used for data-parallel training where each device takes a
    camera shard."""
    assert len({(c.width, c.height) for c in cams}) == 1, "resolutions must match"
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)


def take_camera(batch: Camera, i: Any) -> Camera:
    """Index one camera out of a stacked Camera batch (jit-safe)."""
    return jax.tree.map(lambda x: x[i], batch)
