import math

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_mesh_splatting_tpu.core import (
    C0,
    eval_sh,
    face_frames,
    face_scaling_rotation_quat,
    focal2fov,
    fov2focal,
    gaussians_to_pseudomesh,
    make_camera,
    quat_to_rotmat,
    rgb_to_sh,
    sh_to_rgb,
    soup_scaling_rotation_quat,
)


# ---------------------------------------------------------------- SH

def test_sh_deg0_is_constant():
    sh = jnp.zeros((5, 3, 16)).at[:, :, 0].set(1.0)
    dirs = jnp.array([[0.0, 0.0, 1.0]] * 5)
    out = eval_sh(0, sh, dirs)
    np.testing.assert_allclose(np.asarray(out), C0, atol=1e-6)


def test_sh_rgb_roundtrip():
    rgb = jnp.array([[0.2, 0.5, 0.9]])
    np.testing.assert_allclose(np.asarray(sh_to_rgb(rgb_to_sh(rgb))), np.asarray(rgb), atol=1e-6)


def test_sh_orthogonality_montecarlo():
    # int_{S^2} Y_i Y_j dOmega = delta_ij; MC check with 200k dirs.
    key = jax.random.key(0)
    d = jax.random.normal(key, (200_000, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    # evaluate all 16 deg-3 basis fns via one-hot coefficient vectors
    basis = []
    for i in range(16):
        sh = jnp.zeros((1, 1, 16)).at[0, 0, i].set(1.0)
        sh = jnp.broadcast_to(sh, (d.shape[0], 1, 16))
        basis.append(np.asarray(eval_sh(3, sh, d))[:, 0])
    B = np.stack(basis, axis=1)  # (N, 16)
    gram = B.T @ B / d.shape[0] * 4 * np.pi
    np.testing.assert_allclose(gram, np.eye(16), atol=0.15)


def test_sh_degrees_nest():
    key = jax.random.key(1)
    sh = jax.random.normal(key, (7, 3, 25))
    dirs = jax.random.normal(jax.random.key(2), (7, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    # zeroing higher coeffs makes deg-4 eval equal deg-2 eval
    sh_trunc = sh.at[:, :, 9:].set(0.0)
    np.testing.assert_allclose(
        np.asarray(eval_sh(4, sh_trunc, dirs)), np.asarray(eval_sh(2, sh, dirs)), atol=1e-5
    )


# ---------------------------------------------------------------- cameras

def test_fov_focal_roundtrip():
    assert math.isclose(focal2fov(fov2focal(0.7, 800), 800), 0.7, rel_tol=1e-9)


def test_camera_center_matches_inverse():
    # a camera looking down -z from (0, 0, 5): c2w rotation identity
    R = np.eye(3)
    T = np.array([0.0, 0.0, 5.0])  # w2c translation
    cam = make_camera(R, T, 0.8, 0.8, 64, 64)
    # cam center = -R @ T for w2c = [R^T | T] with R = c2w rotation
    np.testing.assert_allclose(np.asarray(cam.cam_center), [0, 0, -5.0], atol=1e-5)


def test_projection_maps_center_ray():
    R = np.eye(3)
    T = np.array([0.0, 0.0, 2.0])
    cam = make_camera(R, T, 0.8, 0.8, 64, 64)
    # world point on the optical axis in front of the camera
    p = jnp.array([0.0, 0.0, 1.0, 1.0])  # view z = 3
    clip = cam.full_proj @ p
    ndc = clip[:3] / clip[3]
    np.testing.assert_allclose(np.asarray(ndc[:2]), [0.0, 0.0], atol=1e-6)
    # depth increases with distance, z in [0, zfar] convention
    p2 = jnp.array([0.0, 0.0, 50.0, 1.0])
    clip2 = cam.full_proj @ p2
    assert clip2[2] / clip2[3] > ndc[2]


def test_projection_offcenter_sign():
    R = np.eye(3)
    T = np.array([0.0, 0.0, 2.0])
    cam = make_camera(R, T, 0.8, 0.8, 64, 64)
    # +x in view space -> +x ndc
    p = jnp.array([0.5, 0.0, 1.0, 1.0])
    clip = cam.full_proj @ p
    assert clip[0] / clip[3] > 0


# ---------------------------------------------------------------- face frames

def _canonical_triangle():
    # right triangle in the xy plane
    return jnp.array([[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])


def test_face_frames_orthonormal():
    key = jax.random.key(3)
    tris = jax.random.normal(key, (64, 3, 3))
    frame = face_frames(tris)
    R = np.asarray(frame.rotation)
    eye = np.broadcast_to(np.eye(3), R.shape)
    np.testing.assert_allclose(R.transpose(0, 2, 1) @ R, eye, atol=1e-4)


def test_face_frames_normal_axis():
    frame = face_frames(_canonical_triangle())
    # column 0 is the face normal = +z for ccw xy triangle
    np.testing.assert_allclose(np.asarray(frame.rotation[0][:, 0]), [0, 0, 1], atol=1e-6)
    # scales: s0 tiny, s1 = |centroid->v1|/2, s2 > 0
    s = np.asarray(frame.scales[0])
    assert s[0] < 1e-6
    centroid = np.array([1 / 3, 1 / 3, 0.0])
    np.testing.assert_allclose(s[1], np.linalg.norm([1, 0, 0] - centroid) / 2, atol=1e-5)
    assert s[2] > 0


def test_soup_roundtrip_flat_gaussians():
    """gs_flat -> pseudomesh -> re-derived scaling/rot reproduces the
    Gaussians (README.md:616 invariant: results_gs_flat == results_gs_points
    up to numerics)."""
    key = jax.random.key(4)
    n = 128
    xyz = jax.random.normal(key, (n, 3))
    q = jax.random.normal(jax.random.key(5), (n, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = jnp.where(q[:, :1] < 0, -q, q)
    s_plane = jnp.exp(jax.random.normal(jax.random.key(6), (n, 2)) * 0.3)
    scaling = jnp.concatenate([jnp.full((n, 1), 1e-8), s_plane], axis=1)

    tris = gaussians_to_pseudomesh(xyz, scaling, q)
    s_back, q_back = soup_scaling_rotation_quat(tris)

    # centers preserved exactly
    np.testing.assert_allclose(np.asarray(tris[:, 0]), np.asarray(xyz), atol=1e-6)
    # recovered in-plane extents equal original (sorted large-first by the
    # pseudomesh construction)
    s_sorted = np.sort(np.asarray(s_plane), axis=1)[:, ::-1]
    np.testing.assert_allclose(np.asarray(s_back), s_sorted, rtol=1e-4, atol=1e-5)
    # the recovered frame spans the same plane: covariance matrices match
    from gaussian_mesh_splatting_tpu.core import covariance_from_scaling_rotation

    cov_orig = covariance_from_scaling_rotation(scaling, 1.0, q)
    scaling_back = jnp.concatenate([jnp.full((n, 1), 1e-8), s_back], axis=1)
    cov_back = covariance_from_scaling_rotation(scaling_back, 1.0, q_back)
    np.testing.assert_allclose(np.asarray(cov_back), np.asarray(cov_orig), rtol=1e-3, atol=1e-5)


def test_face_scaling_rotation_quat_shapes():
    s, q = face_scaling_rotation_quat(jax.random.normal(jax.random.key(7), (10, 3, 3)))
    assert s.shape == (10, 3) and q.shape == (10, 4)
    R = quat_to_rotmat(q)
    assert np.all(np.isfinite(np.asarray(R)))
