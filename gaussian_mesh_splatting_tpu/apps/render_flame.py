"""FLAME avatar rendering — the reference's `scripts/render_flame.py`:
re-run the FLAME decoder with trained (or hand-edited/animated) params and
render through the flame model (render_flame.py:34-73)."""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser("render_flame")
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--animated", action="store_true",
                   help="sweep jaw + expression over frames")
    p.add_argument("--frames", type=int, default=30)
    p.add_argument("--camera_index", type=int, default=0)
    p.add_argument("--dump_obj", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..io.checkpoint import snapshot_dir
    from ..io.config_io import load_cfg
    from ..io.obj import save_obj
    from ..io.snapshots import load_snapshot
    from ..models.flame.decoder import load_flame_pickle
    from ..models.flame_gaussian import FlameGaussianModel
    from ..renderer import render
    from ..scene import Scene
    from .render import latest_iteration, save_png

    cfg = load_cfg(args.model_path)
    sh_degree = int(cfg.get("sh_degree", 3))
    rig = load_flame_pickle(cfg["flame_model"])
    model = FlameGaussianModel(rig)
    scene = Scene(
        cfg["source_path"], "gs_flame",
        white_background=bool(cfg.get("white_background", False)),
        eval=True, flame_rig=rig, shuffle=False,
    )
    iteration = args.iteration if args.iteration > 0 else latest_iteration(args.model_path)
    state = load_snapshot("gs_flame", snapshot_dir(args.model_path, iteration), sh_degree)
    if "faces" not in state["consts"]:
        state["consts"] = {"faces": rig.lbs_model.faces}

    cam, _ = (scene.test_cameras or scene.train_cameras)[args.camera_index]
    bg = jnp.ones(3)  # reference renders FLAME on white (render_flame.py:129)
    backend = "pallas" if jax.default_backend() == "tpu" else "reference"

    @jax.jit
    def render_with(params):
        st = dict(state, params=params)
        bag = model.to_bag(st)
        out = render(bag, cam, bg, sh_degree=sh_degree, backend=backend)
        return jnp.clip(out.image, 0.0, 1.0)

    out_dir = os.path.join(args.model_path, "renders_flame_animated" if args.animated else "renders_flame")
    n_frames = args.frames if args.animated else 1
    for i in range(n_frames):
        params = dict(state["params"])
        if args.animated:
            t = i / max(n_frames - 1, 1)
            # jaw open/close + expression sweep
            pose = params["flame_pose"]
            params["flame_pose"] = pose.at[0, 3].set(0.3 * np.sin(2 * np.pi * t))
            exp = params["flame_exp"]
            params["flame_exp"] = exp.at[0, 0].set(2.0 * np.sin(2 * np.pi * t))
        img = np.asarray(render_with(params))
        save_png(os.path.join(out_dir, f"{i:05d}.png"), img)
        if args.dump_obj:
            verts = np.asarray(model.decode_vertices(params))
            save_obj(os.path.join(out_dir, f"head_{i:05d}.obj"), verts,
                     np.asarray(rig.lbs_model.faces))
    print(f"wrote {n_frames} frames to {out_dir}")


if __name__ == "__main__":
    main()
