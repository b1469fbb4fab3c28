"""Mesh-to-mesh morph rendering — the reference's
`scripts/render_from_mesh_to_mesh.py:54-68`: linear interpolation between
the trained mesh and an edited target obj, rendered per frame through the
gs_mesh animated path."""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser("render_mesh_morph")
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--target_mesh", required=True, help="edited .obj, same topology")
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--camera_index", type=int, default=0)
    p.add_argument("--transform_target", action="store_true",
                   help="apply the Blender [x,z,-y] transform to the target")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..io.checkpoint import snapshot_dir
    from ..io.config_io import load_cfg
    from ..io.obj import load_obj
    from ..io.snapshots import load_snapshot
    from ..models import mesh as mesh_model
    from ..renderer import render
    from ..scene import Scene
    from ..scene.dataset_readers import transform_mesh_vertices
    from .render import latest_iteration, save_png

    cfg = load_cfg(args.model_path)
    sh_degree = int(cfg.get("sh_degree", 3))
    scene = Scene(
        cfg["source_path"], "gs_mesh",
        white_background=bool(cfg.get("white_background", False)),
        eval=True, num_splats=int(cfg.get("num_splats", 2)), shuffle=False,
    )
    iteration = args.iteration if args.iteration > 0 else latest_iteration(args.model_path)
    state = load_snapshot("gs_mesh", snapshot_dir(args.model_path, iteration), sh_degree)
    if "faces" not in state["consts"]:
        state["consts"] = scene.init_model_state(mesh_model, sh_degree)["consts"]

    target_v, _ = load_obj(args.target_mesh)
    if args.transform_target:
        target_v = transform_mesh_vertices(target_v)
    v0 = np.asarray(state["params"]["vertices"])
    assert target_v.shape == v0.shape, "target mesh must keep topology"
    faces = np.asarray(state["consts"]["faces"])

    cam, _ = (scene.test_cameras or scene.train_cameras)[args.camera_index]
    bg = jnp.ones(3) if cfg.get("white_background") else jnp.zeros(3)
    backend = "pallas" if jax.default_backend() == "tpu" else "reference"

    @jax.jit
    def render_frame(state, triangles):
        bag = mesh_model.to_bag(state, triangles=triangles)
        out = render(bag, cam, bg, sh_degree=sh_degree, backend=backend)
        return jnp.clip(out.image, 0.0, 1.0)

    out_dir = os.path.join(args.model_path, "mesh_morph")
    for i in range(args.frames):
        t = i / max(args.frames - 1, 1)
        v = (1 - t) * v0 + t * target_v
        img = np.asarray(render_frame(state, jnp.asarray(v[faces])))
        save_png(os.path.join(out_dir, f"{i:05d}.png"), img)
    print(f"wrote {args.frames} morph frames to {out_dir}")


if __name__ == "__main__":
    main()
