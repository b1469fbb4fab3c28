"""Mesh-face local frames: the heart of the GaMeS parameterization.

Two directions, both pure functions over arrays:

  * forward (``face_frames`` / ``soup_frames``): triangles -> per-face
    orthonormal frame + in-plane extents, from which Gaussian scale/rotation
    are derived. Mirrors the reference's `prepare_scaling_rot`
    (games/mesh_splatting/scene/gaussian_mesh_model.py:103-151 — centroid
    variant; games/flat_splatting/scene/points_gaussian_model.py:60-104 —
    vertex-origin variant).
  * inverse (``gaussians_to_pseudomesh``): flat Gaussians -> triangle soup
    ("pseudomesh"), the render-only `gs_points` parameterization
    (points_gaussian_model.py:28-58).

Everything is vectorized over faces; quaternion conversion happens at the
call site (models layer) so these stay reusable for covariance-only paths.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .transforms import quat_to_rotmat, rotmat_to_quat


class FaceFrame(NamedTuple):
    scales: jax.Array  # (F, 3) — [eps/s0, s1, s2] in-face extents
    rotation: jax.Array  # (F, 3, 3) rotation matrix; columns = frame axes


def _dot(v: jax.Array, u: jax.Array) -> jax.Array:
    return jnp.sum(v * u, axis=-1, keepdims=True)


def _safe_norm(v: jax.Array, eps: float) -> jax.Array:
    """||v|| + eps with a NaN-free gradient at v == 0 (degenerate faces:
    plain jnp.linalg.norm has d|v|/dv = v/|v| = 0/0 there)."""
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    return jnp.sqrt(sq + eps * eps) + eps


def _normalize(v: jax.Array, eps: float) -> jax.Array:
    return v / _safe_norm(v, eps)


def face_frames(triangles: jax.Array, eps: float = 1e-8) -> FaceFrame:
    """Centroid-based face frame for `gs_mesh` (gaussian_mesh_model.py:103-151).

    Frame axes: v0 = face normal; v1 = direction centroid -> vertex 1;
    v2 = Gram-Schmidt of (centroid -> vertex 2) against {v0, v1}.
    Extents: s0 = eps (flat), s1 = |centroid->v1| / 2, s2 = <v2_init, v2> / 2.

    Args:
      triangles: (F, 3, 3) face vertex positions.
    Returns:
      FaceFrame(scales (F,3), rotation (F,3,3)); rotation columns are
      (v0, v1, v2) so R maps the canonical Gaussian axes onto the frame.
    """
    normals = jnp.cross(
        triangles[:, 1] - triangles[:, 0], triangles[:, 2] - triangles[:, 0]
    )
    v0 = _normalize(normals, eps)
    means = jnp.mean(triangles, axis=1)
    v1_raw = triangles[:, 1] - means
    v1_norm = _safe_norm(v1_raw, eps)
    v1 = v1_raw / v1_norm
    v2_init = triangles[:, 2] - means
    v2 = v2_init - _dot(v2_init, v0) * v0 - _dot(v2_init, v1) * v1
    v2 = _normalize(v2, eps)

    s1 = v1_norm / 2.0
    s2 = _dot(v2_init, v2) / 2.0
    s0 = jnp.full_like(s1, eps)
    scales = jnp.concatenate([s0, s1, s2], axis=-1)
    # Stack as rows then transpose -> columns are (v0, v1, v2).
    rotation = jnp.swapaxes(jnp.stack([v0, v1, v2], axis=1), -2, -1)
    return FaceFrame(scales=scales, rotation=rotation)


def soup_frames(triangles: jax.Array, eps: float = 1e-8) -> FaceFrame:
    """Vertex-origin frame for `gs_points` triangle soups
    (points_gaussian_model.py:60-104).

    Edges from vertex 1: e2 = v2 - v1, e3 = v3 - v1. Frame: r1 = normal,
    r2 = e2 direction, r3 = Gram-Schmidt of e3. Extents: s2 = |e2|,
    s3 = <e3, r3> (full lengths, not halves — this is the inverse map's
    convention so a round trip is exact).

    Returns:
      FaceFrame with scales (F, 3) = [|e2|, <e3,r3>, 0-pad is NOT added here];
      actually scales = (F, 2) packed as [s2, s3] plus rotation (F,3,3) with
      columns (r1, r2, r3). The flat eps axis is prepended by the model layer.
    """
    v1, v2, v3 = triangles[:, 0], triangles[:, 1], triangles[:, 2]
    e2 = v2 - v1
    e3 = v3 - v1
    r1 = _normalize(jnp.cross(e2, e3), eps)
    s2 = _safe_norm(e2, eps)
    r2 = e2 / s2
    r3 = e3 - _dot(e3, r1) * r1 - _dot(e3, r2) * r2
    r3 = _normalize(r3, eps)
    s3 = _dot(e3, r3)
    scales = jnp.concatenate([s2, s3], axis=-1)  # (F, 2)
    rotation = jnp.swapaxes(jnp.stack([r1, r2, r3], axis=1), -2, -1)
    return FaceFrame(scales=scales, rotation=rotation)


def gaussians_to_pseudomesh(
    xyz: jax.Array, scaling: jax.Array, rotation_q: jax.Array
) -> jax.Array:
    """Inverse parameterization: flat Gaussians -> triangle soup
    (points_gaussian_model.py:28-58).

    v1 = center; v2 = center + s_major * axis_major; v3 = center + s_minor *
    axis_minor, with the larger in-plane axis ordered first.

    Args:
      xyz: (N, 3) centers.
      scaling: (N, 3) activated scales; the last two are the in-plane axes.
      rotation_q: (N, 4) quaternions (w, x, y, z).
    Returns:
      (N, 3, 3) triangles.
    """
    R = quat_to_rotmat(rotation_q)
    axes = jnp.swapaxes(R, -2, -1)  # rows of R^T = columns of R = axes
    s2 = scaling[:, -2:-1]
    s3 = scaling[:, -1:]
    v1 = xyz
    cand2 = v1 + s2 * axes[:, 1]
    cand3 = v1 + s3 * axes[:, 2]
    swap = (s2 > s3)[:, 0]
    v2 = jnp.where(swap[:, None], cand2, cand3)
    v3 = jnp.where(swap[:, None], cand3, cand2)
    return jnp.stack([v1, v2, v3], axis=1)


def face_scaling_rotation_quat(
    triangles: jax.Array, eps: float = 1e-8
) -> tuple[jax.Array, jax.Array]:
    """Convenience: `face_frames` + quaternion conversion.

    Returns ((F,3) scales, (F,4) quats)."""
    frame = face_frames(triangles, eps)
    return frame.scales, rotmat_to_quat(frame.rotation)


def soup_scaling_rotation_quat(
    triangles: jax.Array, eps: float = 1e-8
) -> tuple[jax.Array, jax.Array]:
    """Convenience: `soup_frames` + quaternion conversion.

    Returns ((F,2) |scales|, (F,4) quats). Absolute value matches the
    reference's `.abs()` before log (points_gaussian_model.py:99)."""
    frame = soup_frames(triangles, eps)
    return jnp.abs(frame.scales), rotmat_to_quat(frame.rotation)
