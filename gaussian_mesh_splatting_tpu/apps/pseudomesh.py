"""Pseudomesh tooling — the flat-GS editing pipeline (README.md:641-677):

  save     : trained gs_flat -> triangle soup ('triangles.npz' + scaled
             .obj) — scripts/save_pseudomesh.py:62-90;
  dummy    : alpha-shape-style surface reconstruction from soup vertices
             (scipy Delaunay + circumradius filter replaces the reference's
             open3d alpha shapes, scripts/create_dummy_mesh.py:8-38);
  retarget : re-express each soup triangle in its nearest dummy-mesh
             face's local frame and replay on an edited mesh —
             scripts/edit_pseudomesh_based_on_estimated_mesh.py:14-94;
  render   : render an (edited) soup through the points model —
             scripts/render_from_object.py.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def save_pseudomesh(args) -> None:
    import jax.numpy as jnp

    from ..io.checkpoint import snapshot_dir
    from ..io.obj import save_obj
    from ..io.snapshots import load_snapshot
    from ..models import points
    from .render import latest_iteration

    iteration = args.iteration if args.iteration > 0 else latest_iteration(args.model_path)
    state = load_snapshot("gs_points", snapshot_dir(args.model_path, iteration),
                          sh_degree=args.sh_degree)
    tris = np.asarray(points.pseudomesh_from_state(state))
    out_dir = os.path.join(args.model_path, "pseudomesh")
    os.makedirs(out_dir, exist_ok=True)
    np.savez(os.path.join(out_dir, "triangles.npz"), triangles=tris)
    save_obj(os.path.join(out_dir, f"scale_{args.obj_scale}.obj"), tris * args.obj_scale)
    print(f"saved {tris.shape[0]} soup triangles to {out_dir}")


def create_dummy_mesh(args) -> None:
    """Surface reconstruction: Delaunay tetrahedralization filtered by
    circumradius < alpha (the alpha-shape boundary)."""
    from scipy.spatial import Delaunay

    from ..io.obj import save_obj

    tris = np.load(args.triangles)["triangles"]
    pts = tris[:, 0]  # gaussian centers
    if args.max_points and pts.shape[0] > args.max_points:
        sel = np.random.default_rng(0).choice(pts.shape[0], args.max_points, replace=False)
        pts = pts[sel]
    tet = Delaunay(pts)
    # circumradius filter
    simplices = tet.simplices
    a, b, c, d = (pts[simplices[:, i]] for i in range(4))
    # circumradius via determinant formula
    def sq(x):
        return np.sum(x * x, axis=1)

    A = np.stack([b - a, c - a, d - a], axis=1)
    rhs = 0.5 * np.stack([sq(b) - sq(a), sq(c) - sq(a), sq(d) - sq(a)], axis=1)
    ok = np.abs(np.linalg.det(A)) > 1e-12
    centers = np.zeros((simplices.shape[0], 3))
    centers[ok] = np.linalg.solve(A[ok], rhs[ok][..., None])[..., 0]
    radius = np.linalg.norm(centers - a, axis=1)
    keep = ok & (radius < args.alpha)
    # boundary faces: faces appearing exactly once among kept tets
    faces = {}
    for tet_idx in np.nonzero(keep)[0]:
        s = simplices[tet_idx]
        for f in ([0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]):
            key = tuple(sorted(s[f]))
            faces[key] = faces.get(key, 0) + 1
    boundary = np.array([k for k, v in faces.items() if v == 1], np.int32)
    save_obj(args.output, pts.astype(np.float32), boundary)
    print(f"dummy mesh: {pts.shape[0]} verts, {boundary.shape[0]} boundary faces -> {args.output}")


def retarget(args) -> None:
    """Bind soup triangles to nearest dummy-mesh faces and replay their
    local-frame coordinates on the edited mesh."""
    from scipy.spatial import cKDTree

    from ..io.obj import load_obj, save_obj

    tris = np.load(args.triangles)["triangles"]  # (N, 3, 3)
    v_src, f_src = load_obj(args.estimated_mesh)
    v_dst, f_dst = load_obj(args.edited_mesh)
    assert f_src.shape == f_dst.shape, "edited mesh must keep topology"

    def face_frames_np(v, f):
        t = v[f]
        e1 = t[:, 1] - t[:, 0]
        e2 = t[:, 2] - t[:, 0]
        n = np.cross(e1, e2)
        return t[:, 0], np.stack([n, e1, e2], axis=2)  # origin, (F,3,3) basis cols

    centers_src = v_src[f_src].mean(axis=1)
    tree = cKDTree(centers_src)
    _, nearest = tree.query(tris[:, 0])

    o_src, B_src = face_frames_np(v_src, f_src)
    o_dst, B_dst = face_frames_np(v_dst, f_dst)
    o_s, B_s = o_src[nearest], B_src[nearest]
    o_d, B_d = o_dst[nearest], B_dst[nearest]
    # coords: solve B_s @ c = p - o_s for each soup vertex, replay B_d @ c + o_d
    out = np.empty_like(tris)
    for k in range(3):
        coef = np.linalg.solve(B_s, (tris[:, k] - o_s)[..., None])
        out[:, k] = (B_d @ coef)[..., 0] + o_d
    np.savez(args.output, triangles=out.astype(np.float32))
    save_obj(args.output.replace(".npz", ".obj"), out.astype(np.float32))
    print(f"retargeted {tris.shape[0]} triangles -> {args.output}")


def animate_soup(args) -> None:
    """Time-animated pseudomesh rendering — the reference's
    `scripts/render_points_time_animated.py`: a wave deform over the soup
    vertices per frame, re-deriving scale/rot each frame."""
    import jax
    import jax.numpy as jnp

    from ..io.checkpoint import snapshot_dir
    from ..io.config_io import load_cfg
    from ..io.snapshots import load_snapshot
    from ..models import points
    from ..renderer import render
    from ..scene import Scene
    from .render import latest_iteration, save_png

    cfg = load_cfg(args.model_path)
    sh_degree = int(cfg.get("sh_degree", 3))
    iteration = args.iteration if args.iteration > 0 else latest_iteration(args.model_path)
    state = load_snapshot("gs_points", snapshot_dir(args.model_path, iteration), sh_degree)
    tris0 = np.asarray(points.pseudomesh_from_state(state))
    scene = Scene(
        cfg["source_path"], "gs_flat",
        white_background=bool(cfg.get("white_background", False)),
        eval=True, shuffle=False,
    )
    cam, _ = (scene.test_cameras or scene.train_cameras)[args.camera_index]
    bg = jnp.ones(3) if cfg.get("white_background") else jnp.zeros(3)
    backend = "pallas" if jax.default_backend() == "tpu" else "reference"

    @jax.jit
    def render_one(state, tris):
        bag = points.to_bag(state, tris)
        out = render(bag, cam, bg, sh_degree=sh_degree, backend=backend)
        return jnp.clip(out.image, 0.0, 1.0)

    out_dir = os.path.join(args.model_path, "soup_animated")
    for i in range(args.frames):
        t = i / max(args.frames - 1, 1)
        tris = tris0.copy()
        # wave deform over all soup vertices (render_points_time_animated.py:27-30)
        tris[..., 1] += args.amplitude * np.sin(
            2 * np.pi * (tris[..., 0] + t)
        )
        img = np.asarray(render_one(state, jnp.asarray(tris)))
        save_png(os.path.join(out_dir, f"{i:05d}.png"), img)
    print(f"wrote {args.frames} frames to {out_dir}")


def render_soup(args) -> None:
    import jax
    import jax.numpy as jnp

    from ..io.checkpoint import snapshot_dir
    from ..io.config_io import load_cfg
    from ..io.obj import load_obj
    from ..io.snapshots import load_snapshot
    from ..models import points
    from ..renderer import render
    from ..scene import Scene
    from .render import latest_iteration, save_png

    cfg = load_cfg(args.model_path)
    sh_degree = int(cfg.get("sh_degree", 3))
    iteration = args.iteration if args.iteration > 0 else latest_iteration(args.model_path)
    state = load_snapshot("gs_points", snapshot_dir(args.model_path, iteration), sh_degree)
    if args.triangles.endswith(".npz"):
        tris = np.load(args.triangles)["triangles"]
    else:
        v, _ = load_obj(args.triangles)
        tris = v.reshape(-1, 3, 3) * args.obj_scale
    scene = Scene(
        cfg["source_path"], "gs_flat",
        white_background=bool(cfg.get("white_background", False)),
        eval=True, shuffle=False,
    )
    bg = jnp.ones(3) if cfg.get("white_background") else jnp.zeros(3)
    backend = "pallas" if jax.default_backend() == "tpu" else "reference"

    @jax.jit
    def render_one(state, tris, cam):
        bag = points.to_bag(state, tris)
        out = render(bag, cam, bg, sh_degree=sh_degree, backend=backend)
        return jnp.clip(out.image, 0.0, 1.0)

    out_dir = os.path.join(args.model_path, "renders_soup")
    for idx, (cam, _) in enumerate(scene.test_cameras or scene.train_cameras):
        img = np.asarray(render_one(state, jnp.asarray(tris), cam))
        save_png(os.path.join(out_dir, f"{idx:05d}.png"), img)
    print(f"rendered soup to {out_dir}")


def main(argv=None):
    p = argparse.ArgumentParser("pseudomesh")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("save")
    s.add_argument("--model_path", "-m", required=True)
    s.add_argument("--iteration", type=int, default=-1)
    s.add_argument("--sh_degree", type=int, default=3)
    s.add_argument("--obj_scale", type=float, default=100.0)
    s.set_defaults(fn=save_pseudomesh)

    d = sub.add_parser("dummy")
    d.add_argument("--triangles", required=True)
    d.add_argument("--output", required=True)
    d.add_argument("--alpha", type=float, default=0.1)
    d.add_argument("--max_points", type=int, default=20000)
    d.set_defaults(fn=create_dummy_mesh)

    r = sub.add_parser("retarget")
    r.add_argument("--triangles", required=True)
    r.add_argument("--estimated_mesh", required=True)
    r.add_argument("--edited_mesh", required=True)
    r.add_argument("--output", required=True)
    r.set_defaults(fn=retarget)

    rr = sub.add_parser("render")
    rr.add_argument("--model_path", "-m", required=True)
    rr.add_argument("--triangles", required=True)
    rr.add_argument("--iteration", type=int, default=-1)
    rr.add_argument("--obj_scale", type=float, default=0.01)
    rr.set_defaults(fn=render_soup)

    an = sub.add_parser("animate")
    an.add_argument("--model_path", "-m", required=True)
    an.add_argument("--iteration", type=int, default=-1)
    an.add_argument("--frames", type=int, default=60)
    an.add_argument("--amplitude", type=float, default=0.1)
    an.add_argument("--camera_index", type=int, default=0)
    an.set_defaults(fn=animate_soup)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
