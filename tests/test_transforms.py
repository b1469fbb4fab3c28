import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_mesh_splatting_tpu.core import (
    build_scaling_rotation,
    covariance_from_scaling_rotation,
    inverse_sigmoid,
    quat_to_rotmat,
    rotmat_to_quat,
    strip_symmetric,
    unstrip_symmetric,
)


def random_quats(key, n):
    q = jax.random.normal(key, (n, 4))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_to_rotmat_identity():
    q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    R = quat_to_rotmat(q)
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)


def test_quat_to_rotmat_known_90deg_z():
    # 90 deg about z: q = (cos45, 0, 0, sin45)
    s = np.sin(np.pi / 4)
    q = jnp.array([[np.cos(np.pi / 4), 0.0, 0.0, s]])
    R = np.asarray(quat_to_rotmat(q))[0]
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_rotmat_is_orthonormal():
    q = random_quats(jax.random.key(0), 128)
    R = np.asarray(quat_to_rotmat(q))
    eye = np.broadcast_to(np.eye(3), R.shape)
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_quat_rotmat_roundtrip():
    q = np.asarray(random_quats(jax.random.key(1), 512))
    # standardize sign for comparison (w >= 0)
    q = np.where(q[:, :1] < 0, -q, q)
    q_back = np.asarray(rotmat_to_quat(quat_to_rotmat(jnp.asarray(q))))
    np.testing.assert_allclose(q_back, q, atol=1e-5)


def test_rotmat_to_quat_near_branch_boundaries():
    # rotations by ~180 deg around each axis stress all 4 branches
    for axis in range(3):
        for angle in [np.pi - 1e-3, np.pi, np.pi + 1e-3]:
            v = np.zeros(3)
            v[axis] = 1.0
            c, s = np.cos(angle / 2), np.sin(angle / 2)
            q = np.array([[c, *(s * v)]], dtype=np.float32)
            R = quat_to_rotmat(jnp.asarray(q))
            q2 = rotmat_to_quat(R)
            R2 = quat_to_rotmat(q2)
            np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)


def test_covariance_matches_direct_construction():
    key = jax.random.key(2)
    q = random_quats(key, 64)
    s = jnp.exp(jax.random.normal(jax.random.key(3), (64, 3)) * 0.3)
    six = covariance_from_scaling_rotation(s, 1.0, q)
    assert six.shape == (64, 6)
    R = np.asarray(quat_to_rotmat(q))
    S = np.zeros((64, 3, 3))
    for i in range(3):
        S[:, i, i] = np.asarray(s)[:, i]
    L = R @ S
    cov = L @ L.transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(unstrip_symmetric(six)), cov, atol=1e-5)


def test_strip_unstrip_roundtrip():
    key = jax.random.key(4)
    A = jax.random.normal(key, (10, 3, 3))
    sym = A @ jnp.swapaxes(A, -1, -2)
    np.testing.assert_allclose(
        np.asarray(unstrip_symmetric(strip_symmetric(sym))), np.asarray(sym), atol=1e-6
    )


def test_build_scaling_rotation_columns_scaled():
    q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    s = jnp.array([[2.0, 3.0, 4.0]])
    L = np.asarray(build_scaling_rotation(s, q))[0]
    np.testing.assert_allclose(L, np.diag([2.0, 3.0, 4.0]), atol=1e-6)


def test_inverse_sigmoid():
    x = jnp.array([0.1, 0.5, 0.9])
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(inverse_sigmoid(x))), np.asarray(x), atol=1e-6
    )


def test_grad_flows_through_quat_conversion():
    def loss(q):
        return jnp.sum(quat_to_rotmat(q) ** 2)

    g = jax.grad(loss)(jnp.array([[0.9, 0.1, 0.2, 0.3]]))
    assert np.all(np.isfinite(np.asarray(g)))
