"""Round-5 at-scale convergence proof (VERDICT r4 ask #6).

Builds a SELF-CONSISTENT bench-scale dataset — 5120-face icosphere,
800x800, SH degree 3, 100 train + 20 test cameras, GT rendered by the
framework itself from a randomized mesh-Gaussian state — then runs the
full 30k-iteration schedule for BOTH `gs_mesh` (51,200 mesh-bound
Gaussians, constant LR, no densification — reference train.py:129 config
semantics) and `gs` (free Gaussians initialized from the mesh vertices,
full densify/clone/split/prune + opacity resets at scale), and writes the
eval curves to VERIFY_r5.json.

Also re-runs the r4 toy scene for 5k iters logging BOTH train- and
test-camera PSNR to diagnose the r4 "2k->3k test-PSNR dip" (VERIFY_r4
showed 46.0@2k -> 42.7@3k with no explanation).

Usage: python tools_verify_scale.py [--quick]   (--quick: 600 iters smoke)
"""
import json
import os
import re
import subprocess
import sys

QUICK = "--quick" in sys.argv
ROOT = "/tmp/scale_scene"
OUT = {"gs_mesh": "/tmp/scale_out_mesh", "gs": "/tmp/scale_out_gs"}
SIZE = 800
N_TRAIN, N_TEST = 100, 20


def build_scene():
    import numpy as np

    os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
    import jax
    import jax.numpy as jnp
    from PIL import Image

    sys.path.insert(0, "/root/repo")
    from gaussian_mesh_splatting_tpu.io.obj import save_obj
    from gaussian_mesh_splatting_tpu.models import mesh as mesh_model
    from gaussian_mesh_splatting_tpu.renderer import render
    from gaussian_mesh_splatting_tpu.scene import Scene

    # icosphere, 4 subdivisions -> 5120 faces / 2562 verts
    phi = (1 + np.sqrt(5)) / 2
    verts = np.array(
        [[-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
         [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
         [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1]],
        np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array(
        [[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
         [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
         [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
         [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
        np.int64)
    for _ in range(4):
        vlist = [tuple(v) for v in verts]
        cache = {}

        def midpoint(i, j):
            key = (min(i, j), max(i, j))
            if key not in cache:
                m = verts[i] + verts[j]
                m /= np.linalg.norm(m)
                cache[key] = len(vlist)
                vlist.append(tuple(m))
            return cache[key]

        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        verts = np.array(vlist)
        faces = np.array(new_faces)
    # lumpy radius so the scene has real geometry to learn
    rng = np.random.default_rng(7)
    bump = 1.0 + 0.25 * np.sin(4 * verts[:, 0]) * np.cos(
        3 * verts[:, 1]
    ) + 0.15 * np.sin(5 * verts[:, 2])
    verts = (verts * bump[:, None]).astype(np.float32)
    print(f"mesh: {len(verts)} verts, {len(faces)} faces")

    fovx = 0.8
    os.makedirs(ROOT, exist_ok=True)
    paths = {}
    for split, n_cams, off in [("train", N_TRAIN, 0.0), ("test", N_TEST, 0.31)]:
        os.makedirs(os.path.join(ROOT, split), exist_ok=True)
        frames = []
        for i in range(n_cams):
            angle = 2 * np.pi * (i + off) / n_cams
            elev = 0.9 * np.sin(2.1 * i + off)  # vary elevation
            c = np.array([3.2 * np.sin(angle) * np.cos(elev),
                          3.2 * np.sin(elev) + 0.2,
                          3.2 * np.cos(angle) * np.cos(elev)])
            fwd = -c / np.linalg.norm(c)
            up = np.array([0.0, 1.0, 0.0])
            right = np.cross(up, fwd)
            right /= np.linalg.norm(right)
            true_up = np.cross(fwd, right)
            c2w = np.eye(4)
            c2w[:3, :3] = np.stack([right, true_up, -fwd], axis=1)
            c2w[:3, 3] = c
            p = os.path.join(ROOT, split, f"r_{i}.png")
            Image.fromarray(
                np.zeros((SIZE, SIZE, 4), np.uint8), "RGBA"
            ).save(p)
            paths[(split, i)] = p
            frames.append({"file_path": f"./{split}/r_{i}",
                           "transform_matrix": c2w.tolist()})
        with open(os.path.join(ROOT, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": fovx, "frames": frames}, f)

    save_obj(os.path.join(ROOT, "mesh.obj"), verts, faces)
    # (the `gs` run inits from the random 100k-point cloud the Blender
    # reader synthesizes itself — reference scene/dataset_readers.py flow)

    # GT state: randomized mesh-bound Gaussians, SH deg 3
    scene = Scene(ROOT, "gs_mesh", eval=True, num_splats=10, shuffle=False)
    state = scene.init_model_state(mesh_model, sh_degree=3)
    k1, k2 = jax.random.split(jax.random.key(42))
    params = dict(state["params"])
    params["f_dc"] = jax.random.uniform(k1, params["f_dc"].shape) * 2 - 0.5
    params["f_rest"] = (
        jax.random.normal(k2, params["f_rest"].shape) * 0.08
    ).astype(params["f_rest"].dtype)
    params["opacity"] = jnp.full_like(params["opacity"], 2.5)
    gt_state = {"params": params, "consts": state["consts"],
                "alive": state["alive"]}
    bag = mesh_model.to_bag(gt_state)
    print(f"GT model: {bag.xyz.shape[0]} Gaussians")

    backend = "pallas" if jax.default_backend() == "tpu" else "reference"
    for (split, i), p in paths.items():
        cams = scene.train_cameras if split == "train" else scene.test_cameras
        cam, _ = cams[i]
        out = render(bag, cam, jnp.ones(3), sh_degree=3, backend=backend)
        img = np.clip(np.asarray(out.image), 0, 1)
        rgba = np.concatenate([img, np.ones_like(img[..., :1])], axis=-1)
        Image.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(p)
    print("dataset written:", ROOT, "mean GT px:", float(img.mean()))


def run_training(gs_type: str):
    iters = 600 if QUICK else 30_000
    tests = ([300, 600] if QUICK else
             [1000, 2000, 3000, 5000, 7000, 10000, 15000,
              20000, 25000, 30000])
    cmd = [
        sys.executable, "-m", "gaussian_mesh_splatting_tpu.apps.train",
        "--gs_type", gs_type, "-s", ROOT, "-m", OUT[gs_type], "--eval",
        "--iterations", str(iters), "--sh_degree", "3",
        "--white_background", "--backend", "pallas",
        "--test_iterations", *[str(t) for t in tests],
        "--save_iterations", str(iters),
    ]
    if gs_type == "gs_mesh":
        cmd += ["--num_splats", "10"]
    print("RUN:", " ".join(cmd), flush=True)
    proc = subprocess.run(
        cmd, cwd="/root/repo", capture_output=True, text=True, timeout=7200
    )
    sys.stdout.write(proc.stdout[-4000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(f"{gs_type} training failed rc={proc.returncode}")
    curve = [
        {"iteration": int(m.group(1)), "test_psnr": float(m.group(2))}
        for m in re.finditer(r"\[it (\d+)\] eval: test PSNR ([\d.]+)", proc.stdout)
    ]
    train_psnr = [
        {"iteration": int(m.group(1)), "train_psnr": float(m.group(2))}
        for m in re.finditer(r"\[it (\d+)/\d+\] loss [\d.]+ psnr ([\d.]+)",
                             proc.stdout)
    ]
    points = re.findall(r"total_points (\d+)", proc.stdout)
    return {"curve": curve, "train_psnr_log": train_psnr[-12:],
            "final_points": int(points[-1]) if points else None}


def diagnose_toy_dip():
    """Re-run the r4 toy scene for 5k iters; return train vs test PSNR."""
    subprocess.run(
        [sys.executable, "tools_verify_scene.py", "/tmp/dip_scene"],
        cwd="/root/repo", check=True, capture_output=True, timeout=600,
    )
    cmd = [
        sys.executable, "-m", "gaussian_mesh_splatting_tpu.apps.train",
        "--gs_type", "gs_mesh", "-s", "/tmp/dip_scene", "-m", "/tmp/dip_out",
        "--eval", "--iterations", "5000", "--num_splats", "3",
        "--sh_degree", "0", "--white_background", "--backend", "pallas",
        "--test_iterations", "1000", "2000", "3000", "4000", "5000",
        "--save_iterations", "5000",
    ]
    proc = subprocess.run(
        cmd, cwd="/root/repo", capture_output=True, text=True, timeout=3600
    )
    test = [(int(m.group(1)), float(m.group(2))) for m in
            re.finditer(r"\[it (\d+)\] eval: test PSNR ([\d.]+)", proc.stdout)]
    train = [(int(m.group(1)), float(m.group(2))) for m in
             re.finditer(r"\[it (\d+)/\d+\] loss [\d.]+ psnr ([\d.]+)",
                         proc.stdout)]
    return {"test": test, "train_every100_tail": train[-25:]}


def main():
    build_scene()
    results = {
        "scene": {"faces": 5120, "gaussians_gs_mesh": 51200, "size": SIZE,
                  "sh_degree": 3, "train_cams": N_TRAIN, "test_cams": N_TEST,
                  "schedule_iters": 600 if QUICK else 30000},
    }
    for gs_type in ("gs_mesh", "gs"):
        results[gs_type] = run_training(gs_type)
        print(gs_type, "curve:", results[gs_type]["curve"], flush=True)
    if not QUICK:
        results["toy_dip_diagnosis"] = diagnose_toy_dip()
    with open("/root/repo/VERIFY_r5.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote VERIFY_r5.json")


if __name__ == "__main__":
    main()
