"""Scene orchestrator (reference scene/__init__.py:25-114): sniff dataset
type from files on disk + gs_type, run the matching reader, build camera
lists, and initialize (or reload) the model state."""
from __future__ import annotations

import json
import os
import random
import shutil

import jax.numpy as jnp
import numpy as np

from .cameras import camera_list, camera_to_json
from .dataset_readers import (
    SCENE_LOAD_CALLBACKS,
    FlamePointCloud,
    MeshPointCloud,
    MultiMeshPointCloud,
    SceneInfo,
)


def detect_scene_type(source_path: str, gs_type: str) -> str:
    """File-sniffing logic of scene/__init__.py:43-63."""
    if os.path.exists(os.path.join(source_path, "sparse")):
        return "Colmap_Mesh" if gs_type == "gs_multi_mesh" else "Colmap"
    if os.path.exists(os.path.join(source_path, "transforms_train.json")):
        if gs_type == "gs_mesh":
            return "Blender_Mesh"
        if gs_type == "gs_flame":
            return "Blender_FLAME"
        return "Blender"
    raise ValueError(f"could not recognize scene type in {source_path}")


class Scene:
    """Host-side scene: cameras + initial model state.

    Unlike the reference's Scene (which owns a mutable GaussianModel),
    this returns pytree model states via `init_model_state` so training
    stays functional.
    """

    def __init__(
        self,
        source_path: str,
        gs_type: str = "gs",
        *,
        model_path: str | None = None,
        white_background: bool = False,
        eval: bool = False,
        resolution: int = -1,
        images: str | None = None,
        num_splats=2,
        meshes: list[str] | None = None,
        flame_rig=None,
        shuffle: bool = True,
        seed: int = 0,
    ):
        self.gs_type = gs_type
        self.model_path = model_path
        scene_type = detect_scene_type(source_path, gs_type)
        reader = SCENE_LOAD_CALLBACKS[scene_type]
        # `images` names the COLMAP image dir (e.g. images_2/images_4 for
        # pre-downscaled sets, reference scene/dataset_readers.py:144-146 +
        # full_eval.py:40-47); Blender readers key off transforms_*.json.
        if scene_type == "Blender_Mesh":
            info: SceneInfo = reader(source_path, white_background, eval, num_splats)
        elif scene_type == "Colmap_Mesh":
            info = reader(source_path, images, eval, num_splats, meshes)
        elif scene_type == "Blender_FLAME":
            assert flame_rig is not None, "gs_flame needs a FLAME rig"
            info = reader(source_path, white_background, eval, flame_rig)
        elif scene_type == "Colmap":
            info = reader(source_path, images, eval)
        else:
            info = reader(source_path, white_background, eval)
        self.scene_info = info
        self.cameras_extent = float(info.nerf_normalization["radius"])

        if model_path:
            os.makedirs(model_path, exist_ok=True)
            if os.path.exists(info.ply_path):
                shutil.copyfile(info.ply_path, os.path.join(model_path, "input.ply"))
            cams_json = [
                camera_to_json(i, c)
                for i, c in enumerate(info.train_cameras + info.test_cameras)
            ]
            with open(os.path.join(model_path, "cameras.json"), "w") as f:
                json.dump(cams_json, f)

        if shuffle:
            rng = random.Random(seed)
            rng.shuffle(info.train_cameras)

        self.train_cameras = camera_list(info.train_cameras, resolution)
        self.test_cameras = camera_list(info.test_cameras, resolution)

    def init_model_state(self, model, sh_degree: int = 3, capacity: int | None = None) -> dict:
        """Build the initial param state for this scene's gs_type."""
        pcd = self.scene_info.point_cloud
        if isinstance(pcd, MultiMeshPointCloud):
            return model.init_from_meshes(
                [jnp.asarray(v) for v in pcd.vertices],
                [jnp.asarray(f) for f in pcd.faces],
                [jnp.asarray(a) for a in pcd.alpha],
                jnp.asarray(pcd.colors),
                sh_degree=sh_degree,
            )
        if isinstance(pcd, FlamePointCloud):
            return model.init_from_flame(
                jnp.asarray(pcd.alpha),
                jnp.asarray(pcd.colors),
                sh_degree=sh_degree,
                vertices_enlargement_init=pcd.vertices_enlargement_init,
            )
        if isinstance(pcd, MeshPointCloud):
            return model.init_from_mesh(
                jnp.asarray(pcd.vertices),
                jnp.asarray(pcd.faces),
                jnp.asarray(pcd.alpha),
                jnp.asarray(pcd.colors),
                sh_degree=sh_degree,
            )
        return model.init_from_points(
            jnp.asarray(pcd.points),
            jnp.asarray(pcd.colors),
            sh_degree=sh_degree,
            capacity=capacity,
        )
