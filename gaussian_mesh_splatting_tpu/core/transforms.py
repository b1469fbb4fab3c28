"""Rotation / covariance primitives, as pure jax.numpy functions.

Behavioral contract mirrors the reference math (not the code):
  - quaternion convention: real part first (w, x, y, z), cf.
    /root/reference/utils/general_utils.py:158-179 (build_rotation).
  - matrix -> quaternion follows the pytorch3d branch-selection scheme the
    reference vendors (/root/reference/utils/general_utils.py:43-96): all four
    candidate quaternions are formed and the best-conditioned one (largest
    |q| component) is selected, then standardized to non-negative real part.
  - covariance Sigma = R S S^T R^T, compressed to the 6 upper-triangular
    entries in the order (xx, xy, xz, yy, yz, zz)
    (/root/reference/utils/general_utils.py:144-156, 181-190).

All functions are shape-polymorphic over leading batch dims where noted and
safe under jit/vmap/grad (no data-dependent control flow).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def standardize_quaternion(q: jax.Array) -> jax.Array:
    """Flip sign so the real (first) component is non-negative. (..., 4)."""
    return jnp.where(q[..., 0:1] < 0, -q, q)


def quat_normalize(q: jax.Array, eps: float = 0.0) -> jax.Array:
    """Normalize quaternions to unit length. (..., 4)."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / (norm + eps)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Unit-normalize quaternion(s) (..., 4) -> rotation matrices (..., 3, 3).

    Matches the reference element layout (utils/general_utils.py:158-179):
    row-major R such that columns are the rotated basis vectors.
    """
    q = quat_normalize(q)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
            2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
            2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(*q.shape[:-1], 3, 3)


def _sqrt_positive_part(x: jax.Array) -> jax.Array:
    """sqrt(max(0, x)) with a zero subgradient at x <= 0."""
    safe = jnp.where(x > 0, x, 1.0)
    return jnp.where(x > 0, jnp.sqrt(safe), 0.0)


def rotmat_to_quat(rot: jax.Array) -> jax.Array:
    """Rotation matrices (..., 3, 3) -> quaternions (..., 4), real part first.

    Branchless JAX version of the pytorch3d-style conversion the reference
    uses (utils/general_utils.py:43-96): build all four candidates, pick the
    one keyed by the largest diagonal combination, standardize the sign.
    """
    batch_shape = rot.shape[:-2]
    m = rot.reshape(-1, 9)
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = [m[:, i] for i in range(9)]

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    # Candidate quaternions, each scaled by a different q component.
    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[:, 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[:, 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[:, 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[:, 3] ** 2], axis=-1),
        ],
        axis=-2,
    )  # (B, 4 candidates, 4)

    flr = jnp.asarray(0.1, dtype=q_abs.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))

    best = jnp.argmax(q_abs, axis=-1)  # (B,)
    out = jnp.take_along_axis(
        quat_candidates, best[:, None, None].astype(jnp.int32), axis=-2
    )[:, 0, :]
    out = standardize_quaternion(out)
    return out.reshape(*batch_shape, 4)


def build_scaling_rotation(s: jax.Array, q: jax.Array) -> jax.Array:
    """L = R @ diag(s): (..., 3) scales + (..., 4) quats -> (..., 3, 3)."""
    R = quat_to_rotmat(q)
    return R * s[..., None, :]


def strip_symmetric(sym: jax.Array) -> jax.Array:
    """(..., 3, 3) symmetric -> (..., 6) upper triangle (xx,xy,xz,yy,yz,zz)."""
    return jnp.stack(
        [
            sym[..., 0, 0], sym[..., 0, 1], sym[..., 0, 2],
            sym[..., 1, 1], sym[..., 1, 2], sym[..., 2, 2],
        ],
        axis=-1,
    )


def unstrip_symmetric(six: jax.Array) -> jax.Array:
    """(..., 6) -> (..., 3, 3) symmetric. Inverse of strip_symmetric."""
    xx, xy, xz, yy, yz, zz = [six[..., i] for i in range(6)]
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def covariance_from_scaling_rotation(
    scaling: jax.Array, scaling_modifier: float, q: jax.Array
) -> jax.Array:
    """Sigma = (R S)(R S)^T compressed to 6 floats; matches the reference
    python cov3D path (scene/gaussian_model.py:26-31)."""
    L = build_scaling_rotation(scaling_modifier * scaling, q)
    cov = L @ jnp.swapaxes(L, -1, -2)
    return strip_symmetric(cov)


def inverse_sigmoid(x: jax.Array) -> jax.Array:
    return jnp.log(x / (1 - x))
