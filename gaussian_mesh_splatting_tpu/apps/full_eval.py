"""Batch train/render/metrics harness over scene suites — the reference's
`full_eval.py:15-75`, using in-process calls instead of os.system."""
from __future__ import annotations

import argparse
import os

MIPNERF360_OUTDOOR = ["bicycle", "flowers", "garden", "stump", "treehill"]
MIPNERF360_INDOOR = ["room", "counter", "kitchen", "bonsai"]
TANKS_AND_TEMPLES = ["truck", "train"]
DEEP_BLENDING = ["drjohnson", "playroom"]
NERF_SYNTHETIC = ["chair", "drums", "ficus", "hotdog", "lego", "materials", "mic", "ship"]


def main(argv=None):
    p = argparse.ArgumentParser("full_eval")
    p.add_argument("--gs_type", default="gs")
    p.add_argument("--output_path", "-o", default="./eval")
    p.add_argument("--mipnerf360", "-m360", default=None)
    p.add_argument("--tanksandtemples", "-tat", default=None)
    p.add_argument("--deepblending", "-db", default=None)
    p.add_argument("--nerf_synthetic", "-ns", default=None)
    p.add_argument("--skip_training", action="store_true")
    p.add_argument("--skip_rendering", action="store_true")
    p.add_argument("--skip_metrics", action="store_true")
    p.add_argument("--iterations", type=int, default=30_000)
    args = p.parse_args(argv)

    from . import metrics as metrics_app
    from . import render as render_app
    from . import train as train_app

    jobs: list[tuple[str, list[str]]] = []
    if args.mipnerf360:
        for s in MIPNERF360_OUTDOOR:
            jobs.append((os.path.join(args.mipnerf360, s), ["-i", "images_4"]))
        for s in MIPNERF360_INDOOR:
            jobs.append((os.path.join(args.mipnerf360, s), ["-i", "images_2"]))
    if args.tanksandtemples:
        jobs += [(os.path.join(args.tanksandtemples, s), []) for s in TANKS_AND_TEMPLES]
    if args.deepblending:
        jobs += [(os.path.join(args.deepblending, s), []) for s in DEEP_BLENDING]
    if args.nerf_synthetic:
        jobs += [
            (os.path.join(args.nerf_synthetic, s), ["--white_background"])
            for s in NERF_SYNTHETIC
        ]

    model_paths = []
    for source, extra in jobs:
        name = os.path.basename(source)
        model_path = os.path.join(args.output_path, name)
        model_paths.append(model_path)
        if not args.skip_training:
            train_app.main(
                ["--gs_type", args.gs_type, "-s", source, "-m", model_path,
                 "--eval", "--iterations", str(args.iterations), "--quiet"] + extra
            )
        if not args.skip_rendering:
            render_app.main(["-m", model_path, "--skip_train"])
    if not args.skip_metrics:
        metrics_app.main(["-m"] + model_paths)


if __name__ == "__main__":
    main()
