import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_mesh_splatting_tpu.models import MODEL_REGISTRY, get_model
from gaussian_mesh_splatting_tpu.models import flat, mesh, multi_mesh, points, vanilla
from gaussian_mesh_splatting_tpu.renderer import render

from helpers import test_camera


def _points_scene(n=64, key=jax.random.key(0)):
    k1, k2 = jax.random.split(key)
    pts = jax.random.normal(k1, (n, 3)) * 0.5
    cols = jax.random.uniform(k2, (n, 3))
    return pts, cols


def _icosahedron():
    """Small closed mesh for gs_mesh tests."""
    phi = (1 + np.sqrt(5)) / 2
    verts = np.array(
        [
            [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
            [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
            [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1],
        ],
        dtype=np.float32,
    ) / (2 * phi)
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        dtype=np.int32,
    )
    return jnp.asarray(verts), jnp.asarray(faces)


def test_registry_contains_all_variants():
    for t in ["gs", "gs_flat", "gs_mesh", "gs_multi_mesh", "gs_points"]:
        assert t in MODEL_REGISTRY
    with pytest.raises(KeyError):
        get_model("nope")


def test_vanilla_bag_shapes_and_activation():
    pts, cols = _points_scene()
    state = vanilla.init_from_points(pts, cols, sh_degree=3)
    bag = vanilla.to_bag(state)
    assert bag.xyz.shape == (64, 3)
    assert bag.scaling.shape == (64, 3)
    assert bag.shs.shape == (64, 3, 16)
    assert np.all(np.asarray(bag.scaling) > 0)
    np.testing.assert_allclose(np.asarray(bag.opacity), 0.1, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(bag.rotation, axis=-1)), 1.0, atol=1e-5
    )
    # DC term reproduces the init colors
    from gaussian_mesh_splatting_tpu.core.sh import sh_to_rgb

    np.testing.assert_allclose(
        np.asarray(sh_to_rgb(bag.shs[..., 0])), np.asarray(cols), atol=1e-5
    )


def test_vanilla_capacity_padding():
    pts, cols = _points_scene(n=10)
    state = vanilla.init_from_points(pts, cols, sh_degree=1, capacity=32)
    assert state["params"]["xyz"].shape == (32, 3)
    assert int(state["alive"].sum()) == 10
    bag = vanilla.to_bag(state)
    cam = test_camera(width=32, height=32)
    out = render(bag, cam, jnp.zeros(3), sh_degree=1, backend="reference")
    assert np.all(np.isfinite(np.asarray(out.image)))
    # dead rows must not be visible
    assert np.all(np.asarray(out.radii)[10:] == 0)


def test_flat_bag_first_axis_eps():
    pts, cols = _points_scene()
    state = flat.init_from_points(pts, cols, sh_degree=2)
    bag = flat.to_bag(state)
    assert bag.scaling.shape == (64, 3)
    np.testing.assert_allclose(np.asarray(bag.scaling[:, 0]), 1e-8, atol=1e-10)
    assert np.all(np.asarray(bag.scaling[:, 1:]) > 1e-6)


def test_mesh_bag_barycentric_centers_on_faces():
    verts, faces = _icosahedron()
    f = faces.shape[0]
    s = 3
    key = jax.random.key(1)
    alpha = jax.random.uniform(key, (f, s, 3))
    colors = jax.random.uniform(jax.random.key(2), (f * s, 3))
    state = mesh.init_from_mesh(verts, faces, alpha, colors, sh_degree=2)
    bag = mesh.to_bag(state)
    assert bag.xyz.shape == (f * s, 3)
    # every center must lie inside its face's plane (convex combination)
    tris = np.asarray(verts)[np.asarray(faces)]  # (F,3,3)
    xyz = np.asarray(bag.xyz).reshape(f, s, 3)
    a = np.asarray(mesh.normalized_alpha(state["params"]["alpha"]))
    recon = np.einsum("fsa,fad->fsd", a, tris)
    np.testing.assert_allclose(xyz, recon, atol=1e-5)
    # convexity: alphas positive and sum to one
    assert np.all(a > 0)
    np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-5)


def test_mesh_animation_triangles_override_moves_gaussians():
    verts, faces = _icosahedron()
    f = faces.shape[0]
    alpha = jax.random.uniform(jax.random.key(3), (f, 2, 3))
    colors = jax.random.uniform(jax.random.key(4), (f * 2, 3))
    state = mesh.init_from_mesh(verts, faces, alpha, colors)
    bag0 = mesh.to_bag(state)
    shifted = (verts + jnp.array([1.0, 0.0, 0.0]))[faces]
    bag1 = mesh.to_bag(state, triangles=shifted)
    np.testing.assert_allclose(
        np.asarray(bag1.xyz - bag0.xyz)[:, 0], 1.0, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(bag1.xyz - bag0.xyz)[:, 1:], 0.0, atol=1e-5)
    # rigid translation leaves scale/rotation untouched
    np.testing.assert_allclose(np.asarray(bag1.scaling), np.asarray(bag0.scaling), atol=1e-5)


def test_mesh_gradients_flow_to_vertices():
    verts, faces = _icosahedron()
    f = faces.shape[0]
    alpha = jax.random.uniform(jax.random.key(5), (f, 2, 3))
    colors = jax.random.uniform(jax.random.key(6), (f * 2, 3))
    state = mesh.init_from_mesh(verts, faces, alpha, colors, sh_degree=0)
    cam = test_camera(width=32, height=32)

    def loss(params):
        s = dict(state, params=params)
        bag = mesh.to_bag(s)
        out = render(bag, cam, jnp.ones(3), sh_degree=0, backend="reference")
        return jnp.mean(out.image)

    g = jax.grad(loss)(state["params"])
    for name in ["vertices", "alpha", "scale", "opacity", "f_dc"]:
        arr = np.asarray(g[name])
        assert np.all(np.isfinite(arr)), name
        assert np.abs(arr).max() > 0, f"no grad for {name}"


def test_multi_mesh_concatenation_matches_single():
    verts, faces = _icosahedron()
    f = faces.shape[0]
    alpha = jax.random.uniform(jax.random.key(7), (f, 2, 3))
    colors = jax.random.uniform(jax.random.key(8), (f * 2, 3))
    single = mesh.init_from_mesh(verts, faces, alpha, colors)
    bag_single = mesh.to_bag(single)

    colors2 = jnp.concatenate([colors, colors], axis=0)
    multi = multi_mesh.init_from_meshes(
        [verts, verts + 2.0], [faces, faces], [alpha, alpha], colors2
    )
    bag_multi = multi_mesh.to_bag(multi)
    assert bag_multi.xyz.shape[0] == 2 * bag_single.xyz.shape[0]
    np.testing.assert_allclose(
        np.asarray(bag_multi.xyz[: f * 2]), np.asarray(bag_single.xyz), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(bag_multi.xyz[f * 2 :] - bag_single.xyz), 2.0, atol=1e-5
    )


def test_points_roundtrip_renders_like_flat():
    """README.md:616 invariant: gs_flat and gs_points renders agree."""
    pts, cols = _points_scene(n=48, key=jax.random.key(9))
    state = flat.init_from_points(pts, cols, sh_degree=1)
    # give the disks varied shape/orientation
    state["params"]["rotation"] = jax.random.normal(jax.random.key(10), (48, 4))
    state["params"]["scaling"] = jax.random.normal(jax.random.key(11), (48, 2)) * 0.3 - 2.5
    cam = test_camera(width=48, height=48)
    bag_flat = flat.to_bag(state)
    out_flat = render(bag_flat, cam, jnp.zeros(3), sh_degree=1, backend="reference")

    tris = points.pseudomesh_from_state(state)
    bag_pts = points.to_bag(state, tris)
    out_pts = render(bag_pts, cam, jnp.zeros(3), sh_degree=1, backend="reference")

    np.testing.assert_allclose(
        np.asarray(out_pts.image), np.asarray(out_flat.image), atol=2e-3
    )
