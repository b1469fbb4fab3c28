"""Mesh-animation rendering — the reference's
`scripts/render_time_animated.py` (GaMeS headline feature): deform the
trained mesh's vertices over time, re-derive the Gaussians per frame
(renderer/gaussian_animated_renderer/__init__.py:61-73 semantics live in
models.mesh.to_bag(triangles=...)), and render the sequence.

The deform library mirrors the reference's example functions
(render_time_animated.py:28-65)."""
from __future__ import annotations

import argparse
import os

import numpy as np


# ------------------------------------------------------------ deform library

def transform_fly(vertices: np.ndarray, t: float) -> np.ndarray:
    """'Flying hotdog' style sinusoidal lift + flap (cf.
    render_time_animated.py:transform_hotdog_fly)."""
    v = vertices.copy()
    v[:, 2] = v[:, 2] + 0.25 * np.sin(2 * np.pi * t)
    v[:, 0] = v[:, 0] * (1.0 + 0.1 * np.sin(4 * np.pi * t))
    return v


def transform_wave(vertices: np.ndarray, t: float) -> np.ndarray:
    v = vertices.copy()
    v[:, 1] = v[:, 1] + 0.1 * np.sin(4 * np.pi * (v[:, 0] + t))
    return v


def transform_twist(vertices: np.ndarray, t: float) -> np.ndarray:
    v = vertices.copy()
    angle = 0.5 * np.sin(2 * np.pi * t) * v[:, 2]
    c, s = np.cos(angle), np.sin(angle)
    x, y = v[:, 0].copy(), v[:, 1].copy()
    v[:, 0] = c * x - s * y
    v[:, 1] = s * x + c * y
    return v


DEFORMS = {"fly": transform_fly, "wave": transform_wave, "twist": transform_twist}


def main(argv=None):
    p = argparse.ArgumentParser("render_animated")
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--deform", default="fly", choices=sorted(DEFORMS))
    p.add_argument("--camera_index", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..io.checkpoint import snapshot_dir
    from ..io.config_io import load_cfg
    from ..io.snapshots import load_snapshot
    from ..models import mesh as mesh_model
    from ..renderer import render
    from ..scene import Scene
    from .render import latest_iteration, save_png

    cfg = load_cfg(args.model_path)
    gs_type = cfg.get("gs_type", "gs_mesh")
    assert gs_type == "gs_mesh", "render_animated drives gs_mesh models"
    sh_degree = int(cfg.get("sh_degree", 3))
    scene = Scene(
        cfg["source_path"], gs_type,
        white_background=bool(cfg.get("white_background", False)),
        eval=True, num_splats=int(cfg.get("num_splats", 2)), shuffle=False,
    )
    iteration = args.iteration if args.iteration > 0 else latest_iteration(args.model_path)
    state = load_snapshot(gs_type, snapshot_dir(args.model_path, iteration), sh_degree)
    if "faces" not in state["consts"]:
        state["consts"] = scene.init_model_state(mesh_model, sh_degree)["consts"]

    cam, _ = scene.test_cameras[args.camera_index] if scene.test_cameras else scene.train_cameras[args.camera_index]
    bg = jnp.ones(3) if cfg.get("white_background") else jnp.zeros(3)
    backend = "pallas" if jax.default_backend() == "tpu" else "reference"

    @jax.jit
    def render_frame(state, triangles):
        bag = mesh_model.to_bag(state, triangles=triangles)
        out = render(bag, cam, bg, sh_degree=sh_degree, backend=backend)
        return jnp.clip(out.image, 0.0, 1.0)

    deform = DEFORMS[args.deform]
    verts0 = np.asarray(state["params"]["vertices"])
    faces = np.asarray(state["consts"]["faces"])
    out_dir = os.path.join(args.model_path, f"animated_{args.deform}")
    for i in range(args.frames):
        t = i / max(args.frames - 1, 1)
        tris = jnp.asarray(deform(verts0, t)[faces])
        img = np.asarray(render_frame(state, tris))
        save_png(os.path.join(out_dir, f"{i:05d}.png"), img)
    print(f"wrote {args.frames} frames to {out_dir}")


if __name__ == "__main__":
    main()
