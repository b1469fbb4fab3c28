import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_mesh_splatting_tpu.models.flame import (
    batch_rigid_transform,
    batch_rodrigues,
    flame_forward,
    lbs,
    make_random_flame_like_rig,
)
from gaussian_mesh_splatting_tpu.models.flame_gaussian import FlameGaussianModel
from gaussian_mesh_splatting_tpu.renderer import render

from helpers import test_camera


def _rig():
    return make_random_flame_like_rig(jax.random.key(0), n_verts=96)


def test_rodrigues_identity_and_known():
    R = batch_rodrigues(jnp.zeros((1, 3)))
    np.testing.assert_allclose(np.asarray(R[0]), np.eye(3), atol=1e-6)
    # 90 degrees about z
    R = batch_rodrigues(jnp.array([[0.0, 0.0, np.pi / 2]]))
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(np.asarray(R[0]), expected, atol=1e-5)


def test_rodrigues_orthonormal():
    v = jax.random.normal(jax.random.key(1), (64, 3))
    R = np.asarray(batch_rodrigues(v))
    eye = np.broadcast_to(np.eye(3), R.shape)
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-5)


def test_rigid_transform_root_rotation_moves_children():
    # two joints: child offset along x; rotate root 90deg about z
    joints = jnp.array([[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]]])
    rot = batch_rodrigues(jnp.array([[0.0, 0.0, np.pi / 2], [0.0, 0.0, 0.0]]))[None]
    posed, A = batch_rigid_transform(rot, joints, (-1, 0))
    np.testing.assert_allclose(np.asarray(posed[0, 1]), [0.0, 1.0, 0.0], atol=1e-5)


def test_lbs_zero_pose_is_template_plus_blendshape():
    rig = _rig()
    m = rig.lbs_model
    B = 1
    betas = jnp.zeros((B, m.shapedirs.shape[-1]))
    pose = jnp.zeros((B, 5 * 3))
    verts, joints = lbs(
        betas, pose, m.v_template, m.shapedirs, m.posedirs,
        m.j_regressor, rig.parents, m.lbs_weights,
    )
    np.testing.assert_allclose(np.asarray(verts[0]), np.asarray(m.v_template), atol=1e-5)
    # nonzero shape betas displace along shapedirs
    betas2 = betas.at[0, 0].set(2.0)
    verts2, _ = lbs(
        betas2, pose, m.v_template, m.shapedirs, m.posedirs,
        m.j_regressor, rig.parents, m.lbs_weights,
    )
    expected = np.asarray(m.v_template) + 2.0 * np.asarray(m.shapedirs[..., 0])
    np.testing.assert_allclose(np.asarray(verts2[0]), expected, atol=1e-5)


def test_lbs_global_rotation_rotates_all_vertices():
    rig = _rig()
    m = rig.lbs_model
    betas = jnp.zeros((1, m.shapedirs.shape[-1]))
    angle = jnp.array([[0.0, 0.0, np.pi / 2] + [0.0] * 12])
    verts, _ = lbs(
        betas, angle, m.v_template, m.shapedirs, m.posedirs,
        m.j_regressor, rig.parents, m.lbs_weights,
    )
    # global rotation about root joint: ||v - j0|| preserved
    j0 = np.asarray(m.j_regressor @ m.v_template)[0]
    d_before = np.linalg.norm(np.asarray(m.v_template) - j0, axis=1)
    d_after = np.linalg.norm(np.asarray(verts[0]) - j0, axis=1)
    np.testing.assert_allclose(d_after, d_before, atol=1e-4)


def test_flame_forward_param_packing_and_transl():
    rig = _rig()
    shape = jnp.zeros((1, 100))
    expr = jnp.zeros((1, 50))
    pose = jnp.zeros((1, 6))
    neck = jnp.zeros((1, 3))
    v0, _ = flame_forward(rig, shape, expr, pose, neck)
    v1, _ = flame_forward(rig, shape, expr, pose, neck, transl=jnp.ones((1, 3)))
    np.testing.assert_allclose(np.asarray(v1 - v0), 1.0, atol=1e-6)


@pytest.mark.slow  # full FLAME decoder + render autodiff
def test_gs_flame_end_to_end_gradients():
    """The gs_flame acceptance test: pixel gradients reach FLAME shape,
    expression, pose, neck, translation and enlargement params."""
    rig = _rig()
    model = FlameGaussianModel(rig)
    f = int(rig.lbs_model.faces.shape[0])
    s = 2
    alpha = jax.random.uniform(jax.random.key(2), (f, s, 3))
    colors = jax.random.uniform(jax.random.key(3), (f * s, 3))
    state = model.init_from_flame(alpha, colors, sh_degree=0, vertices_enlargement_init=2.0)
    cam = test_camera(width=32, height=32)

    def loss(params):
        st = dict(state, params=params)
        bag = model.to_bag(st)
        out = render(bag, cam, jnp.ones(3), sh_degree=0, backend="reference")
        return jnp.mean(out.image)

    g = jax.grad(loss)(state["params"])
    for name in [
        "flame_shape", "flame_exp", "flame_pose", "flame_neck_pose",
        "flame_trans", "vertices_enlargement", "alpha", "scale", "opacity",
    ]:
        arr = np.asarray(g[name])
        assert np.all(np.isfinite(arr)), name
        assert np.abs(arr).max() > 0, f"no gradient into {name}"


@pytest.mark.slow  # full FLAME decoder + render autodiff
def test_gs_flame_expression_changes_render():
    rig = _rig()
    model = FlameGaussianModel(rig)
    f = int(rig.lbs_model.faces.shape[0])
    alpha = jax.random.uniform(jax.random.key(4), (f, 1, 3))
    colors = jax.random.uniform(jax.random.key(5), (f, 3))
    state = model.init_from_flame(alpha, colors, sh_degree=0, vertices_enlargement_init=2.0)
    cam = test_camera(width=32, height=32)
    bag0 = model.to_bag(state)
    img0 = render(bag0, cam, jnp.zeros(3), sh_degree=0, backend="reference").image

    p2 = dict(state["params"])
    p2["flame_exp"] = p2["flame_exp"].at[0, :5].set(5.0)
    bag1 = model.to_bag(dict(state, params=p2))
    img1 = render(bag1, cam, jnp.zeros(3), sh_degree=0, backend="reference").image
    assert float(jnp.mean(jnp.abs(img1 - img0))) > 1e-5
