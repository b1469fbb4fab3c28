"""Dataset readers: COLMAP, Blender/NeRF-synthetic, mesh, multi-mesh and
FLAME scene loading — host-side numpy, semantics matching the reference
(scene/dataset_readers.py, games/*/scene/dataset_readers.py).

Key behavioral contracts preserved:
  * Blender transforms: camera-to-world with OpenGL axes, converted by
    negating Y/Z columns; R stored as the transposed world-to-view rotation
    (scene/dataset_readers.py:190-198);
  * RGBA images alpha-composited onto the background color
    (dataset_readers.py:204-210);
  * scene normalization: camera-centroid radius * 1.1 (getNerfppNorm,
    dataset_readers.py:45-66);
  * COLMAP eval split: every 8th image is test (llffhold,
    dataset_readers.py:148-153);
  * mesh vertices axis-transformed [x, z, -y]
    (games/mesh_splatting/scene/dataset_readers.py:33-37) and per-face
    random barycentric seeds (dataset_readers.py:73-83).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable

import numpy as np

from ..core.camera import focal2fov, fov2focal, world_to_view
from ..core.sh import sh_to_rgb
from ..io.obj import load_obj
from ..io.ply import fetch_point_cloud, store_point_cloud
from . import colmap_loader as colmap


@dataclasses.dataclass
class CameraInfo:
    uid: int
    R: np.ndarray  # camera-to-world rotation (reference convention)
    T: np.ndarray  # world-to-view translation
    fovy: float
    fovx: float
    image: np.ndarray  # (H, W, 3) float32 in [0, 1]
    image_path: str
    image_name: str
    width: int
    height: int
    # 4th channel of an RGBA source image, multiplied into the GT at load
    # (reference utils/camera_utils.py:43-47 + scene/cameras.py:43-45);
    # None for RGB sources (mask of ones).
    alpha_mask: np.ndarray | None = None


@dataclasses.dataclass
class PointCloud:
    points: np.ndarray
    colors: np.ndarray
    normals: np.ndarray


@dataclasses.dataclass
class MeshPointCloud(PointCloud):
    """gs_mesh payload (games/mesh_splatting/utils/graphics_utils.py:19-27)."""

    alpha: np.ndarray  # (F, S, 3)
    vertices: np.ndarray  # (V, 3)
    faces: np.ndarray  # (F, 3)


@dataclasses.dataclass
class MultiMeshPointCloud(PointCloud):
    alpha: list
    vertices: list
    faces: list


@dataclasses.dataclass
class FlamePointCloud(PointCloud):
    """gs_flame payload (games/flame_splatting/utils/graphics_utils.py:19-33)."""

    alpha: np.ndarray
    faces: np.ndarray
    vertices_init: np.ndarray
    rig: object  # FlameRig
    vertices_enlargement_init: float


@dataclasses.dataclass
class SceneInfo:
    point_cloud: PointCloud
    train_cameras: list
    test_cameras: list
    nerf_normalization: dict
    ply_path: str


def get_nerfpp_norm(cam_infos: list[CameraInfo]) -> dict:
    """Camera-centroid radius normalization (dataset_readers.py:45-66)."""
    centers = []
    for cam in cam_infos:
        W2C = world_to_view(cam.R, cam.T)
        C2W = np.linalg.inv(W2C)
        centers.append(C2W[:3, 3])
    centers = np.stack(centers, axis=0)
    avg = centers.mean(axis=0)
    diagonal = np.linalg.norm(centers - avg, axis=1).max()
    return {"translate": -avg, "radius": diagonal * 1.1}


def _load_image(path: str, white_background: bool) -> np.ndarray:
    from PIL import Image

    im = np.asarray(Image.open(path).convert("RGBA"), dtype=np.float32) / 255.0
    bg = np.ones(3) if white_background else np.zeros(3)
    rgb = im[:, :, :3] * im[:, :, 3:4] + bg * (1.0 - im[:, :, 3:4])
    return rgb.astype(np.float32)


def read_cameras_from_transforms(
    path: str, transformsfile: str, white_background: bool, extension: str = ".png"
) -> list[CameraInfo]:
    """Blender/NeRF-synthetic camera reader (dataset_readers.py:179-219)."""
    cam_infos = []
    with open(os.path.join(path, transformsfile)) as f:
        contents = json.load(f)
    fovx = contents["camera_angle_x"]
    for idx, frame in enumerate(contents["frames"]):
        file_path = frame["file_path"]
        if file_path.startswith("./"):
            file_path = file_path[2:]
        cam_name = os.path.join(path, file_path + extension)
        c2w = np.array(frame["transform_matrix"], dtype=np.float64)
        c2w[:3, 1:3] *= -1  # OpenGL/Blender -> COLMAP axes
        w2c = np.linalg.inv(c2w)
        R = np.transpose(w2c[:3, :3])
        T = w2c[:3, 3]
        image = _load_image(cam_name, white_background)
        h, w = image.shape[:2]
        fovy = focal2fov(fov2focal(fovx, w), h)
        cam_infos.append(
            CameraInfo(
                uid=idx, R=R, T=T, fovy=fovy, fovx=fovx, image=image,
                image_path=cam_name, image_name=os.path.splitext(os.path.basename(cam_name))[0],
                width=w, height=h,
            )
        )
    return cam_infos


def read_colmap_cameras(path: str, images_dir: str) -> list[CameraInfo]:
    sparse = os.path.join(path, "sparse/0")
    try:
        extr = colmap.read_extrinsics_binary(os.path.join(sparse, "images.bin"))
        intr = colmap.read_intrinsics_binary(os.path.join(sparse, "cameras.bin"))
    except FileNotFoundError:
        extr = colmap.read_extrinsics_text(os.path.join(sparse, "images.txt"))
        intr = colmap.read_intrinsics_text(os.path.join(sparse, "cameras.txt"))

    cam_infos = []
    for key in extr:
        im = extr[key]
        cam = intr[im.camera_id]
        R = np.transpose(colmap.qvec2rotmat(im.qvec))
        T = np.array(im.tvec)
        if cam.model == "SIMPLE_PINHOLE":
            fovy = focal2fov(cam.params[0], cam.height)
            fovx = focal2fov(cam.params[0], cam.width)
        elif cam.model == "PINHOLE":
            fovy = focal2fov(cam.params[1], cam.height)
            fovx = focal2fov(cam.params[0], cam.width)
        else:
            raise ValueError(
                f"unsupported COLMAP camera model {cam.model}: undistort first "
                "(only PINHOLE/SIMPLE_PINHOLE, like the reference "
                "scene/dataset_readers.py:85-95)"
            )
        image_path = os.path.join(images_dir, os.path.basename(im.name))
        # COLMAP GTs are NOT composited: the raw RGB is kept and a 4th
        # channel (if any) rides along as gt_alpha_mask, multiplied into the
        # GT at camera-load time — reference utils/camera_utils.py:43-47.
        from PIL import Image

        raw = np.asarray(Image.open(image_path), dtype=np.float32) / 255.0
        if raw.ndim == 2:
            raw = np.repeat(raw[:, :, None], 3, axis=2)
        alpha_mask = raw[:, :, 3:4].copy() if raw.shape[2] == 4 else None
        image = raw[:, :, :3]
        cam_infos.append(
            CameraInfo(
                uid=cam.id, R=R, T=T, fovy=fovy, fovx=fovx, image=image,
                image_path=image_path,
                image_name=os.path.splitext(os.path.basename(image_path))[0],
                width=cam.width, height=cam.height, alpha_mask=alpha_mask,
            )
        )
    cam_infos.sort(key=lambda c: c.image_name)
    return cam_infos


def read_colmap_scene_info(path: str, images: str | None, eval: bool, llffhold: int = 8) -> SceneInfo:
    reading_dir = images if images else "images"
    cam_infos = read_colmap_cameras(path, os.path.join(path, reading_dir))
    if eval:
        train = [c for i, c in enumerate(cam_infos) if i % llffhold != 0]
        test = [c for i, c in enumerate(cam_infos) if i % llffhold == 0]
    else:
        train, test = cam_infos, []
    norm = get_nerfpp_norm(train)

    sparse = os.path.join(path, "sparse/0")
    ply_path = os.path.join(sparse, "points3D.ply")
    if not os.path.exists(ply_path):
        try:
            xyz, rgb, _ = colmap.read_points3D_binary(os.path.join(sparse, "points3D.bin"))
        except FileNotFoundError:
            xyz, rgb, _ = colmap.read_points3D_text(os.path.join(sparse, "points3D.txt"))
        store_point_cloud(ply_path, xyz, rgb)
    pts, cols, nrm = fetch_point_cloud(ply_path)
    pcd = PointCloud(points=pts, colors=cols, normals=nrm)
    return SceneInfo(pcd, train, test, norm, ply_path)


def read_nerf_synthetic_info(
    path: str, white_background: bool, eval: bool, extension: str = ".png", num_pts: int = 100_000
) -> SceneInfo:
    train = read_cameras_from_transforms(path, "transforms_train.json", white_background, extension)
    test = read_cameras_from_transforms(path, "transforms_test.json", white_background, extension)
    if not eval:
        train = train + test
        test = []
    norm = get_nerfpp_norm(train)

    ply_path = os.path.join(path, "points3d.ply")
    if not os.path.exists(ply_path):
        # random init inside the synthetic scene bounds (dataset_readers.py:234-244)
        rng = np.random.default_rng(0)
        xyz = rng.random((num_pts, 3)) * 2.6 - 1.3
        shs = rng.random((num_pts, 3)) / 255.0
        store_point_cloud(ply_path, xyz, np.asarray(sh_to_rgb(shs)) * 255)
    pts, cols, nrm = fetch_point_cloud(ply_path)
    return SceneInfo(PointCloud(pts, cols, nrm), train, test, norm, ply_path)


def transform_mesh_vertices(vertices: np.ndarray, c: float = 1.0) -> np.ndarray:
    """Blender mesh -> scene axes: [x, z, -y] * c
    (games/mesh_splatting/scene/dataset_readers.py:33-37)."""
    v = vertices[:, [0, 2, 1]].copy()
    v[:, 1] = -v[:, 1]
    return v * c


def read_nerf_synthetic_mesh_info(
    path: str, white_background: bool, eval: bool, num_splats: int, extension: str = ".png",
    mesh_file: str = "mesh.obj", seed: int = 0,
) -> SceneInfo:
    """Blender_Mesh reader (games/mesh_splatting/scene/dataset_readers.py:40-105)."""
    train = read_cameras_from_transforms(path, "transforms_train.json", white_background, extension)
    test = read_cameras_from_transforms(path, "transforms_test.json", white_background, extension)
    vertices, faces = load_obj(os.path.join(path, mesh_file))
    vertices = transform_mesh_vertices(vertices)
    triangles = vertices[faces]

    if not eval:
        train = train + test
        test = []
    norm = get_nerfpp_norm(train)

    rng = np.random.default_rng(seed)
    f = triangles.shape[0]
    alpha = rng.random((f, num_splats, 3)).astype(np.float32)
    xyz = np.einsum("fsa,fad->fsd", alpha, triangles).reshape(-1, 3)
    shs = rng.random((xyz.shape[0], 3)) / 255.0
    colors = np.asarray(sh_to_rgb(shs)).astype(np.float32)

    ply_path = os.path.join(path, "points3d.ply")
    store_point_cloud(ply_path, xyz, colors * 255)
    pcd = MeshPointCloud(
        points=xyz, colors=colors, normals=np.zeros_like(xyz),
        alpha=alpha, vertices=vertices.astype(np.float32), faces=faces,
    )
    return SceneInfo(pcd, train, test, norm, ply_path)


def read_colmap_mesh_scene_info(
    path: str, images: str | None, eval: bool, num_splats: list[int] | int,
    meshes: list[str] | None = None, llffhold: int = 8, seed: int = 0,
) -> SceneInfo:
    """Colmap_Mesh reader: COLMAP cameras + N meshes from sparse/0/*.obj
    (games/multi_mesh_splatting/scene/dataset_readers.py:38-116)."""
    base = read_colmap_scene_info(path, images, eval, llffhold)
    sparse = os.path.join(path, "sparse/0")
    if meshes is None:
        meshes = sorted(
            os.path.splitext(f)[0] for f in os.listdir(sparse) if f.endswith(".obj")
        )
    if isinstance(num_splats, int):
        num_splats = [num_splats] * len(meshes)

    rng = np.random.default_rng(seed)
    alpha_l, verts_l, faces_l, xyz_l = [], [], [], []
    for name, s in zip(meshes, num_splats):
        vertices, faces = load_obj(os.path.join(sparse, name + ".obj"))
        tri = vertices[faces]
        alpha = rng.random((tri.shape[0], s, 3)).astype(np.float32)
        xyz_l.append(np.einsum("fsa,fad->fsd", alpha, tri).reshape(-1, 3))
        alpha_l.append(alpha)
        verts_l.append(vertices.astype(np.float32))
        faces_l.append(faces)
    xyz = np.concatenate(xyz_l, axis=0)
    shs = rng.random((xyz.shape[0], 3)) / 255.0
    colors = np.asarray(sh_to_rgb(shs)).astype(np.float32)
    pcd = MultiMeshPointCloud(
        points=xyz, colors=colors, normals=np.zeros_like(xyz),
        alpha=alpha_l, vertices=verts_l, faces=faces_l,
    )
    return SceneInfo(pcd, base.train_cameras, base.test_cameras, base.nerf_normalization, base.ply_path)


def read_nerf_synthetic_flame_info(
    path: str, white_background: bool, eval: bool, rig, extension: str = ".png",
    num_splats_per_face: int = 100, vertices_enlargement: float = 8.35, seed: int = 0,
) -> SceneInfo:
    """Blender_FLAME reader (games/flame_splatting/scene/dataset_readers.py:
    48-130); `rig` is a models.flame.FlameRig (the reference instantiates
    its torch FLAME decoder here)."""
    import jax.numpy as jnp

    from ..models.flame.decoder import flame_forward

    train = read_cameras_from_transforms(path, "transforms_train.json", white_background, extension)
    test = read_cameras_from_transforms(path, "transforms_test.json", white_background, extension)
    if not eval:
        train = train + test
        test = []
    norm = get_nerfpp_norm(train)

    shape_dim = 100
    verts, _ = flame_forward(
        rig,
        jnp.zeros((1, shape_dim)), jnp.zeros((1, 50)), jnp.zeros((1, 6)), jnp.zeros((1, 3)),
    )
    vertices = transform_mesh_vertices(np.asarray(verts[0]), c=vertices_enlargement)
    faces = np.asarray(rig.lbs_model.faces)
    tri = vertices[faces]

    rng = np.random.default_rng(seed)
    alpha = rng.random((tri.shape[0], num_splats_per_face, 3)).astype(np.float32)
    xyz = np.einsum("fsa,fad->fsd", alpha, tri).reshape(-1, 3)
    shs = rng.random((xyz.shape[0], 3)) / 255.0
    colors = np.asarray(sh_to_rgb(shs)).astype(np.float32)
    ply_path = os.path.join(path, "points3d.ply")
    store_point_cloud(ply_path, xyz, colors * 255)
    pcd = FlamePointCloud(
        points=xyz, colors=colors, normals=np.zeros_like(xyz),
        alpha=alpha, faces=faces, vertices_init=vertices, rig=rig,
        vertices_enlargement_init=vertices_enlargement,
    )
    return SceneInfo(pcd, train, test, norm, ply_path)


# the live registry (games/scenes/__init__.py:28-34)
SCENE_LOAD_CALLBACKS: dict[str, Callable] = {
    "Colmap": read_colmap_scene_info,
    "Blender": read_nerf_synthetic_info,
    "Blender_Mesh": read_nerf_synthetic_mesh_info,
    "Colmap_Mesh": read_colmap_mesh_scene_info,
    "Blender_FLAME": read_nerf_synthetic_flame_info,
}
