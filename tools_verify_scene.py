"""Build a self-consistent 128x128 Blender dataset: write placeholder
images, load via the framework's own Scene reader, render GT from a known
mesh-Gaussian scene with the reference renderer, overwrite the images."""
import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import jax
import jax.numpy as jnp
from PIL import Image

from gaussian_mesh_splatting_tpu.io.obj import save_obj
from gaussian_mesh_splatting_tpu.models import mesh as mesh_model
from gaussian_mesh_splatting_tpu.renderer import render
from gaussian_mesh_splatting_tpu.scene import Scene

root = sys.argv[1]
size = 128
n_cams = 8

phi = (1 + np.sqrt(5)) / 2
verts = np.array(
    [[-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
     [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
     [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1]],
    np.float32) / (2 * phi)
faces = np.array(
    [[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
     [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
     [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
     [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
    np.int32)

fovx = 0.8
os.makedirs(root, exist_ok=True)
paths = {}
for split, off in [("train", 0.0), ("test", 0.2)]:
    os.makedirs(os.path.join(root, split), exist_ok=True)
    frames = []
    for i in range(n_cams):
        angle = 2 * np.pi * (i + off) / n_cams
        c = np.array([3 * np.sin(angle), 0.5, 3 * np.cos(angle)])
        fwd = -c / np.linalg.norm(c)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd) / np.linalg.norm(np.cross(up, fwd))
        true_up = np.cross(fwd, right)
        c2w = np.eye(4)
        c2w[:3, :3] = np.stack([right, true_up, -fwd], axis=1)
        c2w[:3, 3] = c
        p = os.path.join(root, split, f"r_{i}.png")
        Image.fromarray(np.zeros((size, size, 4), np.uint8), "RGBA").save(p)
        paths[(split, i)] = p
        frames.append({"file_path": f"./{split}/r_{i}",
                       "transform_matrix": c2w.tolist()})
    with open(os.path.join(root, f"transforms_{split}.json"), "w") as fjs:
        json.dump({"camera_angle_x": fovx, "frames": frames}, fjs)

save_obj(os.path.join(root, "mesh.obj"), verts, faces)

# GT scene: random mesh-bound Gaussians on the mesh as the Scene reader sees it
scene = Scene(root, "gs_mesh", eval=True, num_splats=3, shuffle=False)
state = scene.init_model_state(mesh_model, sh_degree=0)
k1, k2 = jax.random.split(jax.random.key(42))
params = dict(state["params"])
params["f_dc"] = jax.random.uniform(k1, params["f_dc"].shape) * 2 - 0.5
params["opacity"] = jnp.full_like(params["opacity"], 2.0)
gt_state = {"params": params, "consts": state["consts"], "alive": state["alive"]}
bag = mesh_model.to_bag(gt_state)

for (split, i), p in paths.items():
    cams = scene.train_cameras if split == "train" else scene.test_cameras
    cam, _ = cams[i]
    out = render(bag, cam, jnp.ones(3), sh_degree=0, backend="reference")
    img = np.clip(np.asarray(out.image), 0, 1)
    rgba = np.concatenate([img, np.ones_like(img[..., :1])], axis=-1)
    Image.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(p)
print("dataset written:", root, "mean GT px:", float(img.mean()))
