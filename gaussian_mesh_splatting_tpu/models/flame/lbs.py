"""Linear blend skinning in JAX — functional reimplementation of the smplx
`lbs` pipeline the reference FLAME decoder depends on
(games/flame_splatting/FLAME/FLAME.py:32,221-224; smplx.lbs semantics):

  1. shape/expression blendshapes:  v_shaped = T + shapedirs . betas
  2. joints:                        J = J_regressor @ v_shaped
  3. pose correctives:              v_posed = v_shaped + posedirs . (R - I)
  4. forward kinematics over the joint tree (relative -> global transforms)
  5. skinning:                      v = sum_j w_j A_j v_posed

Everything is batched over the leading batch dim and fully differentiable
(the gs_flame acceptance criterion is gradient flow from pixels into
shape/expression/pose parameters, SURVEY.md §7 hard part 5).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LbsModel(NamedTuple):
    """Static (non-trainable) rig data, a pytree of arrays."""

    v_template: jax.Array  # (V, 3)
    shapedirs: jax.Array  # (V, 3, B) shape+expression basis
    posedirs: jax.Array  # (P, V*3) pose-corrective basis (P = 9*(J-1))
    j_regressor: jax.Array  # (J, V)
    parents: jax.Array  # (J,) int32; parents[0] == -1 (root)
    lbs_weights: jax.Array  # (V, J)
    faces: jax.Array  # (F, 3) int32


def batch_rodrigues(rot_vecs: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Axis-angle (N, 3) -> rotation matrices (N, 3, 3)."""
    angle = jnp.linalg.norm(rot_vecs + eps, axis=-1, keepdims=True)  # (N, 1)
    rot_dir = rot_vecs / angle
    cos = jnp.cos(angle)[..., None]  # (N, 1, 1)
    sin = jnp.sin(angle)[..., None]
    rx, ry, rz = rot_dir[..., 0], rot_dir[..., 1], rot_dir[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=-1
    ).reshape(*rot_vecs.shape[:-1], 3, 3)
    ident = jnp.eye(3, dtype=rot_vecs.dtype)
    return ident + sin * K + (1 - cos) * (K @ K)


def blend_shapes(betas: jax.Array, shape_dirs: jax.Array) -> jax.Array:
    """(B, num_betas) x (V, 3, num_betas) -> (B, V, 3)."""
    return jnp.einsum("bl,mkl->bmk", betas, shape_dirs)


def vertices2joints(j_regressor: jax.Array, vertices: jax.Array) -> jax.Array:
    """(J, V) x (B, V, 3) -> (B, J, 3)."""
    return jnp.einsum("jv,bvk->bjk", j_regressor, vertices)


def _with_zeros(R: jax.Array, t: jax.Array) -> jax.Array:
    """(..., 3, 3) + (..., 3, 1) -> (..., 4, 4) homogeneous."""
    top = jnp.concatenate([R, t], axis=-1)  # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], R.dtype), (*R.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def batch_rigid_transform(
    rot_mats: jax.Array, joints: jax.Array, parents
) -> tuple[jax.Array, jax.Array]:
    """Forward kinematics.

    Args:
      rot_mats: (B, J, 3, 3) per-joint relative rotations.
      joints: (B, J, 3) rest-pose joint locations.
      parents: STATIC sequence of J parent indices, parents[0] == -1 (root).
        Static so the tiny joint tree (J=5 for FLAME) unrolls into
        straight-line XLA with no dynamic control flow.
    Returns:
      (posed_joints (B, J, 3), rel_transforms (B, J, 4, 4)) where
      rel_transforms map rest-pose-relative offsets (smplx convention).
    """
    parents = tuple(int(p) for p in parents)
    B, J = joints.shape[:2]
    parent_idx = jnp.array([max(p, 0) for p in parents], jnp.int32)
    has_parent = jnp.array([p >= 0 for p in parents])[None, :, None]
    rel_joints = joints - jnp.where(has_parent, joints[:, parent_idx], 0.0)
    local = _with_zeros(rot_mats, rel_joints[..., None])  # (B, J, 4, 4)

    # sequential chain accumulation, unrolled over the static tree
    transforms = [local[:, 0]]
    for j in range(1, J):
        transforms.append(transforms[parents[j]] @ local[:, j])
    A = jnp.stack(transforms, axis=1)  # (B, J, 4, 4)

    posed_joints = A[..., :3, 3]
    # remove the rest-pose joint contribution: A_rel = A - [0 | A[:, :3,:3] @ J]
    correction = (A[..., :3, :3] @ joints[..., None])[..., 0]  # (B, J, 3)
    A_rel = A.at[..., :3, 3].add(-correction)
    return posed_joints, A_rel


def lbs(
    betas: jax.Array,
    pose: jax.Array,
    v_template: jax.Array,
    shapedirs: jax.Array,
    posedirs: jax.Array,
    j_regressor: jax.Array,
    parents: jax.Array,
    lbs_weights: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Full smplx-style LBS.

    Args:
      betas: (B, num_betas); pose: (B, J*3) axis-angle incl. root.
      v_template: (B, V, 3) or (V, 3).
    Returns:
      (vertices (B, V, 3), joints (B, J, 3))
    """
    B = betas.shape[0]
    if v_template.ndim == 2:
        v_template = jnp.broadcast_to(v_template[None], (B, *v_template.shape))

    v_shaped = v_template + blend_shapes(betas, shapedirs)
    J = vertices2joints(j_regressor, v_shaped)

    n_joints = J.shape[1]
    rot_mats = batch_rodrigues(pose.reshape(-1, 3)).reshape(B, n_joints, 3, 3)
    ident = jnp.eye(3, dtype=betas.dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)  # (B, 9*(J-1))
    pose_offsets = (pose_feature @ posedirs).reshape(B, -1, 3)
    v_posed = v_shaped + pose_offsets

    posed_joints, A = batch_rigid_transform(rot_mats, J, parents)

    W = lbs_weights  # (V, J)
    T = jnp.einsum("vj,bjmn->bvmn", W, A)  # (B, V, 4, 4)
    v_hom = jnp.concatenate(
        [v_posed, jnp.ones((*v_posed.shape[:-1], 1), v_posed.dtype)], axis=-1
    )
    verts = (T @ v_hom[..., None])[..., :3, 0]
    return verts, posed_joints


def vertices2landmarks(
    vertices: jax.Array, faces: jax.Array, lmk_faces_idx: jax.Array, lmk_bary_coords: jax.Array
) -> jax.Array:
    """(B, V, 3), (F, 3), (B, L), (B, L, 3) -> (B, L, 3)."""
    lmk_faces = faces[lmk_faces_idx]  # (B, L, 3)
    lmk_vertices = jnp.take_along_axis(
        vertices[:, None], lmk_faces[..., None].astype(jnp.int32) % vertices.shape[1], axis=2
    )  # (B, L, 3, 3)
    return jnp.einsum("blfi,blf->bli", lmk_vertices, lmk_bary_coords)
