"""Batch rendering CLI — the reference's `scripts/render.py`.

Renders train+test sets of a trained model to PNG under
{model}/{split}/ours_{iteration}/renders_{gs_type}/ + gt/ (render.py:25-36).
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def save_png(path: str, img: np.ndarray) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)


def latest_iteration(model_path: str) -> int:
    root = os.path.join(model_path, "point_cloud")
    iters = [int(d.split("_")[1]) for d in os.listdir(root) if d.startswith("iteration_")]
    return max(iters)


def render_sets(args) -> None:
    import jax
    import jax.numpy as jnp

    from ..io.checkpoint import snapshot_dir
    from ..io.config_io import combined_args
    from ..io.snapshots import load_snapshot
    from ..models import MODEL_REGISTRY
    from ..models.gaussian_bag import GaussianBag
    from ..renderer import render
    from ..scene import Scene

    cfg = combined_args(args.model_path, {
        "source_path": args.source_path, "gs_type": args.gs_type,
    })
    gs_type = cfg.get("gs_type", "gs")
    sh_degree = int(cfg.get("sh_degree", 3))
    backend = "pallas" if jax.default_backend() == "tpu" else "reference"

    flame_rig = None
    if gs_type == "gs_flame":
        from ..models.flame.decoder import load_flame_pickle
        from ..models.flame_gaussian import FlameGaussianModel

        flame_rig = load_flame_pickle(cfg["flame_model"])
        model = FlameGaussianModel(flame_rig)
    else:
        model = MODEL_REGISTRY[gs_type]

    scene = Scene(
        cfg["source_path"], gs_type,
        white_background=bool(cfg.get("white_background", False)),
        eval=bool(cfg.get("eval", True)),
        resolution=int(cfg.get("resolution", -1)),
        images=cfg.get("images"),
        num_splats=int(cfg.get("num_splats", 2)),
        meshes=cfg.get("meshes"),
        flame_rig=flame_rig,
        shuffle=False,
    )
    iteration = args.iteration if args.iteration > 0 else latest_iteration(args.model_path)
    state = load_snapshot(gs_type, snapshot_dir(args.model_path, iteration), sh_degree)
    if gs_type in ("gs_mesh", "gs_multi_mesh", "gs_flame") and "faces" not in state["consts"]:
        # faces travel in the sidecar consts for mesh models; rebuild from scene
        init = scene.init_model_state(model, sh_degree)
        state["consts"] = init["consts"]

    bg = jnp.ones(3) if cfg.get("white_background") else jnp.zeros(3)

    @jax.jit
    def render_one(state, cam):
        if gs_type == "gs_points":
            from ..models import points

            tris = points.pseudomesh_from_state(state)
            bag = points.to_bag(state, tris)
        else:
            bag = model.to_bag(state)
        out = render(bag, cam, bg, sh_degree=sh_degree, backend=backend)
        return jnp.clip(out.image, 0.0, 1.0)

    for split, cameras in [("train", scene.train_cameras), ("test", scene.test_cameras)]:
        if (split == "train" and args.skip_train) or (split == "test" and args.skip_test):
            continue
        base = os.path.join(args.model_path, split, f"ours_{iteration}")
        for idx, (cam, gt) in enumerate(cameras):
            img = np.asarray(render_one(state, cam))
            save_png(os.path.join(base, f"renders_{gs_type}", f"{idx:05d}.png"), img)
            save_png(os.path.join(base, "gt", f"{idx:05d}.png"), gt)
        print(f"rendered {len(cameras)} {split} views to {base}")


def main(argv=None):
    p = argparse.ArgumentParser("render")
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--source_path", "-s", default=None)
    p.add_argument("--gs_type", default=None)
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--skip_test", action="store_true")
    render_sets(p.parse_args(argv))


if __name__ == "__main__":
    main()
