"""COLMAP-format scene + gs_multi_mesh end-to-end on synthetic fixtures."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_mesh_splatting_tpu.io.obj import save_obj
from gaussian_mesh_splatting_tpu.scene import Scene, detect_scene_type
from gaussian_mesh_splatting_tpu.scene.colmap_loader import (
    ColmapCamera,
    ColmapImage,
    rotmat2qvec,
    write_cameras_binary,
    write_images_binary,
    write_points3D_binary,
)


def _make_colmap_dataset(root, n_cams=3, size=16, with_meshes=False):
    from PIL import Image

    sparse = os.path.join(root, "sparse/0")
    os.makedirs(sparse, exist_ok=True)
    images_dir = os.path.join(root, "images")
    os.makedirs(images_dir, exist_ok=True)

    f = 20.0
    cams = {1: ColmapCamera(1, "PINHOLE", size, size, np.array([f, f, size / 2, size / 2]))}
    write_cameras_binary(os.path.join(sparse, "cameras.bin"), cams)

    ims = {}
    rng = np.random.default_rng(0)
    for i in range(n_cams):
        angle = 2 * np.pi * i / n_cams
        c = np.array([3 * np.sin(angle), 0.0, -3 * np.cos(angle)])
        fwd = -c / np.linalg.norm(c)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        true_up = np.cross(fwd, right)
        Rc2w = np.stack([right, true_up, fwd], axis=1)
        R_w2c = Rc2w.T
        T = -R_w2c @ c
        name = f"img_{i}.png"
        ims[i + 1] = ColmapImage(i + 1, rotmat2qvec(R_w2c), T, 1, name)
        img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
        Image.fromarray(img, "RGB").save(os.path.join(images_dir, name))
    write_images_binary(os.path.join(sparse, "images.bin"), ims)

    xyz = rng.normal(size=(50, 3)) * 0.5
    rgb = rng.integers(0, 255, (50, 3)).astype(np.uint8)
    write_points3D_binary(os.path.join(sparse, "points3D.bin"), xyz, rgb)

    if with_meshes:
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32) * 0.5
        faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)
        save_obj(os.path.join(sparse, "obj1.obj"), verts, faces)
        save_obj(os.path.join(sparse, "obj2.obj"), verts - 0.6, faces)
    return root


def test_colmap_scene_loads(tmp_path):
    root = _make_colmap_dataset(str(tmp_path / "scene"))
    assert detect_scene_type(root, "gs") == "Colmap"
    from gaussian_mesh_splatting_tpu.models import vanilla

    scene = Scene(root, "gs", eval=True, shuffle=False)
    # llffhold=8: index 0 is test
    assert len(scene.test_cameras) == 1 and len(scene.train_cameras) == 2
    state = scene.init_model_state(vanilla, sh_degree=1)
    assert state["params"]["xyz"].shape == (50, 3)
    assert os.path.exists(os.path.join(root, "sparse/0/points3D.ply"))


def test_images_dir_plumbing(tmp_path):
    """`--images images_2` must load cameras from the named (pre-downscaled)
    dir and train at its resolution (reference scene/dataset_readers.py:
    144-146 + full_eval.py:40-47; VERDICT r2 ask #6)."""
    from PIL import Image

    size = 16
    root = _make_colmap_dataset(str(tmp_path / "scene"), size=size)
    # half-res copies with a distinctive constant color
    im2 = os.path.join(root, "images_2")
    os.makedirs(im2)
    for name in os.listdir(os.path.join(root, "images")):
        arr = np.full((size // 2, size // 2, 3), [255, 0, 0], np.uint8)
        Image.fromarray(arr, "RGB").save(os.path.join(im2, name))

    scene = Scene(root, "gs", eval=False, shuffle=False, images="images_2")
    cam, gt = scene.train_cameras[0]
    assert gt.shape == (size // 2, size // 2, 3)  # trains at images_2 res
    assert (cam.height, cam.width) == (size // 2, size // 2)
    np.testing.assert_allclose(gt[..., 0], 1.0)  # it read images_2, not images
    np.testing.assert_allclose(gt[..., 1:], 0.0)
    # FoV still derives from the full-res intrinsics
    default_cam, default_gt = Scene(root, "gs", eval=False, shuffle=False).train_cameras[0]
    np.testing.assert_allclose(float(cam.tanfovx), float(default_cam.tanfovx))
    assert default_gt.shape == (size, size, 3)


def test_colmap_alpha_mask_multiplied_into_gt(tmp_path):
    """RGBA COLMAP images: the 4th channel is a gt_alpha_mask multiplied
    into the GT (reference utils/camera_utils.py:43-47 +
    scene/cameras.py:43-45)."""
    from PIL import Image

    size = 16
    root = _make_colmap_dataset(str(tmp_path / "scene"), size=size)
    # overwrite with RGBA: solid gray, alpha 0 on the left half
    for name in os.listdir(os.path.join(root, "images")):
        arr = np.full((size, size, 4), 128, np.uint8)
        arr[:, : size // 2, 3] = 0
        arr[:, size // 2 :, 3] = 255
        Image.fromarray(arr, "RGBA").save(os.path.join(root, "images", name))

    scene = Scene(root, "gs", eval=False, shuffle=False)
    _, gt = scene.train_cameras[0]
    np.testing.assert_allclose(gt[:, : size // 2], 0.0, atol=1e-6)
    np.testing.assert_allclose(gt[:, size // 2 :], 128 / 255, atol=1e-6)


def test_colmap_multimesh_end_to_end(tmp_path):
    root = _make_colmap_dataset(str(tmp_path / "scene"), with_meshes=True)
    assert detect_scene_type(root, "gs_multi_mesh") == "Colmap_Mesh"
    from gaussian_mesh_splatting_tpu.models import multi_mesh
    from gaussian_mesh_splatting_tpu.renderer import render
    from gaussian_mesh_splatting_tpu.train import (
        make_train_state,
        make_train_step,
        optimization_config,
    )

    scene = Scene(root, "gs_multi_mesh", eval=False, num_splats=2, shuffle=False)
    state = scene.init_model_state(multi_mesh, sh_degree=1)
    assert len(state["params"]["vertices"]) == 2
    bag = multi_mesh.to_bag(state)
    assert bag.xyz.shape == (2 * 4 * 2, 3)

    cfg = optimization_config("gs_multi_mesh")
    tstate, tx = make_train_state("gs_multi_mesh", state, cfg)
    step = make_train_step(multi_mesh, tx, cfg, sh_degree_max=1, backend="reference")
    cam, gt = scene.train_cameras[0]
    for _ in range(3):
        tstate, metrics = step(tstate, cam, jnp.asarray(gt), jnp.zeros(3))
    assert np.isfinite(float(metrics["loss"]))
    # joint training moved per-mesh alphas
    for i in range(2):
        assert np.abs(
            np.asarray(tstate.params["alpha"][i] - state["params"]["alpha"][i])
        ).max() > 0
