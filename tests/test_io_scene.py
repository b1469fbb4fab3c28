import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_mesh_splatting_tpu.io.obj import load_obj, save_obj
from gaussian_mesh_splatting_tpu.io.ply import (
    fetch_point_cloud,
    load_gaussians_ply,
    save_gaussians_ply,
    store_point_cloud,
)
from gaussian_mesh_splatting_tpu.scene import Scene, detect_scene_type
from gaussian_mesh_splatting_tpu.scene.cameras import resolve_resolution
from gaussian_mesh_splatting_tpu.scene.colmap_loader import (
    ColmapCamera,
    ColmapImage,
    qvec2rotmat,
    read_extrinsics_binary,
    read_intrinsics_binary,
    read_points3D_binary,
    rotmat2qvec,
    write_cameras_binary,
    write_images_binary,
    write_points3D_binary,
)
from gaussian_mesh_splatting_tpu.scene.dataset_readers import (
    get_nerfpp_norm,
    read_cameras_from_transforms,
)


def test_ply_pointcloud_roundtrip(tmp_path):
    xyz = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    rgb = np.random.default_rng(1).integers(0, 255, (100, 3))
    p = str(tmp_path / "pc.ply")
    store_point_cloud(p, xyz, rgb)
    pts, cols, nrm = fetch_point_cloud(p)
    np.testing.assert_allclose(pts, xyz, atol=1e-6)
    np.testing.assert_allclose(cols * 255, rgb, atol=0.5)


def test_gaussian_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    n, deg = 50, 2
    k = (deg + 1) ** 2
    params = {
        "xyz": rng.normal(size=(n, 3)).astype(np.float32),
        "f_dc": rng.normal(size=(n, 1, 3)).astype(np.float32),
        "f_rest": rng.normal(size=(n, k - 1, 3)).astype(np.float32),
        "opacity": rng.normal(size=(n, 1)).astype(np.float32),
        "scaling": rng.normal(size=(n, 3)).astype(np.float32),
        "rotation": rng.normal(size=(n, 4)).astype(np.float32),
    }
    p = str(tmp_path / "point_cloud.ply")
    save_gaussians_ply(
        p, params["xyz"], params["f_dc"], params["f_rest"], params["opacity"],
        params["scaling"], params["rotation"],
    )
    back = load_gaussians_ply(p, max_sh_degree=deg)
    for key in params:
        np.testing.assert_allclose(back[key], params[key], atol=1e-6, err_msg=key)


def test_gaussian_ply_flat_scaling_padded(tmp_path):
    rng = np.random.default_rng(3)
    n = 10
    p = str(tmp_path / "point_cloud.ply")
    save_gaussians_ply(
        p,
        rng.normal(size=(n, 3)).astype(np.float32),
        rng.normal(size=(n, 1, 3)).astype(np.float32),
        rng.normal(size=(n, 0, 3)).astype(np.float32),
        rng.normal(size=(n, 1)).astype(np.float32),
        rng.normal(size=(n, 2)).astype(np.float32),  # 2-col flat
        rng.normal(size=(n, 4)).astype(np.float32),
    )
    back = load_gaussians_ply(p, max_sh_degree=0)
    assert back["scaling"].shape == (n, 3)
    np.testing.assert_allclose(back["scaling"][:, 0], np.log(1e-8), rtol=1e-5)


def test_obj_roundtrip(tmp_path):
    verts = np.random.default_rng(4).normal(size=(20, 3)).astype(np.float32)
    faces = np.random.default_rng(5).integers(0, 20, (30, 3)).astype(np.int32)
    p = str(tmp_path / "mesh.obj")
    save_obj(p, verts, faces)
    v2, f2 = load_obj(p)
    np.testing.assert_allclose(v2, verts, atol=1e-5)
    np.testing.assert_array_equal(f2, faces)


def test_obj_quad_triangulation(tmp_path):
    p = str(tmp_path / "quad.obj")
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    v, faces = load_obj(p)
    assert faces.shape == (2, 3)


def test_colmap_binary_roundtrip(tmp_path):
    cams = {1: ColmapCamera(1, "PINHOLE", 640, 480, np.array([500.0, 490.0, 320.0, 240.0]))}
    q = rotmat2qvec(np.eye(3))
    ims = {1: ColmapImage(1, q, np.array([0.1, 0.2, 0.3]), 1, "img_0.png")}
    write_cameras_binary(str(tmp_path / "cameras.bin"), cams)
    write_images_binary(str(tmp_path / "images.bin"), ims)
    xyz = np.random.default_rng(6).normal(size=(10, 3))
    rgb = np.random.default_rng(7).integers(0, 255, (10, 3)).astype(np.uint8)
    write_points3D_binary(str(tmp_path / "points3D.bin"), xyz, rgb)

    c2 = read_intrinsics_binary(str(tmp_path / "cameras.bin"))
    i2 = read_extrinsics_binary(str(tmp_path / "images.bin"))
    p2, col2, _ = read_points3D_binary(str(tmp_path / "points3D.bin"))
    assert c2[1].model == "PINHOLE" and c2[1].width == 640
    np.testing.assert_allclose(i2[1].tvec, [0.1, 0.2, 0.3])
    assert i2[1].name == "img_0.png"
    np.testing.assert_allclose(p2, xyz)
    np.testing.assert_array_equal(col2, rgb)


def test_qvec_rotmat_roundtrip():
    rng = np.random.default_rng(8)
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = qvec2rotmat(q)
        np.testing.assert_allclose(rotmat2qvec(R), q, atol=1e-6)


def test_resolution_policy():
    assert resolve_resolution(800, 800, -1) == (800, 800)
    assert resolve_resolution(800, 800, 2) == (400, 400)
    assert resolve_resolution(3200, 1600, -1) == (1600, 800)  # auto downscale
    assert resolve_resolution(800, 600, 400) == (400, 300)


def _make_blender_dataset(root, n_cams=3, size=16):
    """Tiny synthetic Blender-format dataset with a mesh."""
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    for split in ["train", "test"]:
        os.makedirs(os.path.join(root, split), exist_ok=True)
        frames = []
        for i in range(n_cams):
            angle = 2 * np.pi * i / n_cams
            c2w = np.eye(4)
            c2w[:3, 3] = [3 * np.sin(angle), 0, 3 * np.cos(angle)]
            fwd = -c2w[:3, 3] / np.linalg.norm(c2w[:3, 3])
            up = np.array([0.0, 1.0, 0.0])
            right = np.cross(up, fwd) / np.linalg.norm(np.cross(up, fwd))
            true_up = np.cross(fwd, right)
            # OpenGL convention: -z forward
            c2w[:3, :3] = np.stack([right, true_up, -fwd], axis=1)
            frames.append(
                {"file_path": f"./{split}/r_{i}", "transform_matrix": c2w.tolist()}
            )
            img = (np.random.default_rng(i).random((size, size, 4)) * 255).astype(np.uint8)
            Image.fromarray(img, "RGBA").save(os.path.join(root, split, f"r_{i}.png"))
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
    # a mesh
    from gaussian_mesh_splatting_tpu.io.obj import save_obj

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)
    save_obj(os.path.join(root, "mesh.obj"), verts, faces)


def test_scene_blender_and_mesh(tmp_path):
    root = str(tmp_path / "scene")
    _make_blender_dataset(root)
    assert detect_scene_type(root, "gs") == "Blender"
    assert detect_scene_type(root, "gs_mesh") == "Blender_Mesh"

    from gaussian_mesh_splatting_tpu.models import mesh as mesh_model

    scene = Scene(root, "gs_mesh", eval=True, num_splats=2, shuffle=False)
    assert len(scene.train_cameras) == 3 and len(scene.test_cameras) == 3
    cam, gt = scene.train_cameras[0]
    assert gt.shape == (16, 16, 3)
    assert scene.cameras_extent > 0
    state = scene.init_model_state(mesh_model, sh_degree=1)
    assert state["params"]["alpha"].shape == (4, 2, 3)
    # cameras face the origin: render must see the mesh
    from gaussian_mesh_splatting_tpu.renderer import render

    bag = mesh_model.to_bag(state)
    out = render(bag, cam, jnp.zeros(3), sh_degree=1, backend="reference")
    assert int(np.sum(np.asarray(out.radii) > 0)) > 0


def test_camera_transforms_reader_matches_norm(tmp_path):
    root = str(tmp_path / "scene2")
    _make_blender_dataset(root)
    infos = read_cameras_from_transforms(root, "transforms_train.json", False)
    norm = get_nerfpp_norm(infos)
    # cameras on a radius-3 ring around the origin
    assert 3.0 < norm["radius"] < 4.0
