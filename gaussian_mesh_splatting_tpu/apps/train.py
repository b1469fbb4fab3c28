"""Training CLI — the equivalent of the reference's `train.py`.

Usage:
  python -m gaussian_mesh_splatting_tpu.apps.train \
      --gs_type gs_mesh -s <dataset> -m <output> [--eval] ...

Flow (reference train.py:39-157, made functional): Scene -> init state ->
jitted train step per camera (or camera batch under DP) -> periodic eval,
snapshot, checkpoint, densification (gs / gs_flat only, train.py:129).
"""
from __future__ import annotations

import argparse
import json
import os
import random
import time

import numpy as np


def dump_debug_state(model_path: str, it: int, tstate, cam) -> str:
    """Dump the train step's inputs on a non-finite loss — the analogue of
    the reference rasterizer's snapshot_fw/bw.dump written when the CUDA
    kernel fails (arguments/__init__.py:68, README.md debugging section).
    Everything needed to replay the step offline: params, alive mask,
    consts, and the camera matrices."""
    out = os.path.join(model_path, f"debug_dump_{it}.npz")
    flat = {"step": np.asarray(int(tstate.step))}
    leaves, _ = __import__("jax").tree.flatten_with_path(
        {"params": tstate.params, "consts": tstate.consts}
    )
    for path, leaf in leaves:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    flat["alive"] = np.asarray(tstate.alive)
    for attr in ("world_view", "full_proj", "cam_center"):
        flat[f"camera/{attr}"] = np.asarray(getattr(cam, attr))
    np.savez(out, **flat)
    return out


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("train")
    # ModelParams (arguments/__init__.py:47-62)
    p.add_argument("--gs_type", default="gs",
                   choices=["gs", "gs_flat", "gs_mesh", "gs_multi_mesh", "gs_flame"])
    p.add_argument("--source_path", "-s", required=True)
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--images", "-i", default="images")
    p.add_argument("--resolution", "-r", type=int, default=-1)
    p.add_argument("--white_background", "-w", action="store_true")
    p.add_argument("--sh_degree", type=int, default=3)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--num_splats", type=int, default=2)
    p.add_argument("--meshes", nargs="*", default=None)
    p.add_argument("--flame_model", default=None, help="path to flame pickle")
    # OptimizationParams overrides (arguments/__init__.py:72-91)
    p.add_argument("--iterations", type=int, default=None)
    p.add_argument("--lambda_dssim", type=float, default=None)
    p.add_argument("--densify_grad_threshold", type=float, default=None)
    p.add_argument("--densification_interval", type=int, default=None)
    p.add_argument("--densify_from_iter", type=int, default=None)
    p.add_argument("--densify_until_iter", type=int, default=None)
    p.add_argument("--opacity_reset_interval", type=int, default=None)
    p.add_argument("--random_background", action="store_true")
    # control (train.py:226-241)
    p.add_argument("--test_iterations", nargs="+", type=int,
                   default=[7_000, 20_000, 30_000, 60_000, 90_000])
    p.add_argument("--save_iterations", nargs="+", type=int,
                   default=[7_000, 20_000, 30_000, 60_000, 90_000])
    p.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[])
    p.add_argument("--start_checkpoint", default=None)
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--detect_anomaly", action="store_true",
                   help="enable jax debug-nans on the train step and check "
                        "the loss every step; on a non-finite loss, dump the "
                        "rasterizer inputs to <model>/debug_dump_<it>.npz "
                        "(reference train.py:235,262 + the CUDA debug dump)")
    p.add_argument("--save_xyz", action="store_true",
                   help="save raw Gaussian centers to <model>/xyz/<it>.npy "
                        "every 5000 iters (reference train.py:62-64)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data_parallel", action="store_true",
                   help="shard cameras over all local devices "
                        "(alias for --shard data)")
    p.add_argument("--shard", default="none",
                   choices=["none", "data", "rows", "gaussians"],
                   help="multi-device strategy: 'data' = camera DP, "
                        "'rows' = tile-row (pixel) sharded rendering, "
                        "'gaussians' = depth-slab model-sharded rendering "
                        "(parallel/sharded_step.py, SURVEY.md §2.3)")
    p.add_argument("--backend", default="auto",
                   choices=["auto", "pallas", "reference"])
    p.add_argument("--capacity_mult", type=float, default=4.0,
                   help="densify buffer headroom over initial point count")
    p.add_argument("--pair_capacity", type=int, default=None,
                   help="initial rasterizer pair-buffer size (multiple of "
                        "1024; default: heuristic). Auto-grows on overflow.")
    p.add_argument("--ip", default="127.0.0.1", help="network GUI host")
    p.add_argument("--port", type=int, default=0,
                   help="network GUI port (0 disables; reference default 6009)")
    p.add_argument("--profile_steps", default=None,
                   help="START:STOP step range to capture an XProf trace")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp

    from ..io.checkpoint import restore_checkpoint, save_checkpoint, snapshot_dir
    from ..io.config_io import save_cfg
    from ..io.snapshots import save_snapshot
    from ..models import MODEL_REGISTRY
    from ..scene import Scene
    from ..train import (
        densify_and_prune,
        make_eval_render,
        make_train_state,
        make_train_step,
        one_up_sh_degree,
        optimization_config,
        psnr,
        reset_opacity,
    )

    random.seed(args.seed)
    np.random.seed(args.seed)
    if args.detect_anomaly:
        # the analogue of torch.autograd.set_detect_anomaly (reference
        # train.py:262): XLA re-runs any computation that produced a NaN
        # de-optimized and raises at the primitive that made it
        jax.config.update("jax_debug_nans", True)

    backend = args.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "reference"

    flame_rig = None
    if args.gs_type == "gs_flame":
        from ..models.flame.decoder import load_flame_pickle
        from ..models.flame_gaussian import FlameGaussianModel

        assert args.flame_model, "--flame_model <flame2023.pkl> required for gs_flame"
        flame_rig = load_flame_pickle(args.flame_model)
        model = FlameGaussianModel(flame_rig)
    else:
        model = MODEL_REGISTRY[args.gs_type]

    overrides = {
        k: getattr(args, k)
        for k in ["iterations", "lambda_dssim", "densify_grad_threshold",
                  "densification_interval", "densify_from_iter",
                  "densify_until_iter", "opacity_reset_interval"]
        if getattr(args, k) is not None
    }
    if args.random_background:
        overrides["random_background"] = True
    cfg = optimization_config(args.gs_type, **overrides)

    scene = Scene(
        args.source_path,
        args.gs_type,
        model_path=args.model_path,
        white_background=args.white_background,
        eval=args.eval,
        resolution=args.resolution,
        images=args.images,
        num_splats=args.num_splats,
        meshes=args.meshes,
        flame_rig=flame_rig,
        seed=args.seed,
    )
    densify = getattr(cfg, "densify", False)
    n0 = len(scene.scene_info.point_cloud.points)
    capacity = int(n0 * args.capacity_mult) if densify else None
    mstate = scene.init_model_state(model, sh_degree=args.sh_degree, capacity=capacity)
    tstate, tx = make_train_state(args.gs_type, mstate, cfg, scene.cameras_extent)
    if args.start_checkpoint:
        tstate = restore_checkpoint(args.start_checkpoint, tstate)
        print(f"resumed from {args.start_checkpoint} at step {int(tstate.step)}")

    save_cfg(args.model_path, {
        "gs_type": args.gs_type, "source_path": os.path.abspath(args.source_path),
        "model_path": args.model_path, "images": args.images,
        "resolution": args.resolution, "white_background": args.white_background,
        "sh_degree": args.sh_degree, "eval": args.eval,
        "num_splats": args.num_splats, "meshes": args.meshes,
        "flame_model": args.flame_model,
    })

    # pair_capacity starts at the rasterizer's heuristic and doubles whenever
    # a step reports overflow (pairs silently dropped) — the jitted step is
    # rebuilt between steps, mirroring train/densify.py's grow_capacity.
    pair_capacity = None
    if backend == "pallas":
        if args.pair_capacity is not None:
            assert args.pair_capacity % 1024 == 0, "--pair_capacity must be a multiple of 1024"
            pair_capacity = args.pair_capacity
        else:
            from ..ops.rasterize_pallas import default_pair_capacity

            pair_capacity = default_pair_capacity(mstate["alive"].shape[0], 0)

    shard_mode = args.shard
    if args.data_parallel and shard_mode == "none":
        shard_mode = "data"
    if jax.device_count() == 1:
        shard_mode = "none"

    n_dp = 1
    dp_mesh = None
    shard_mesh = None
    if shard_mode == "data":
        from ..core.camera import stack_cameras
        from ..parallel import create_mesh, make_dp_train_step

        n_dp = jax.device_count()
        dp_mesh = create_mesh()
        print(f"data-parallel over {n_dp} devices ({n_dp} cameras/step)")
    elif shard_mode in ("rows", "gaussians"):
        from ..parallel import create_mesh, make_sharded_train_step

        shard_mesh = create_mesh()
        print(f"{shard_mode}-sharded rendering over "
              f"{shard_mesh.devices.size} devices")

    def build_step_fns(cap):
        rkw = {"pair_capacity": cap} if cap is not None else {}
        if shard_mesh is not None:
            step = make_sharded_train_step(
                model, tx, cfg, args.sh_degree, shard_mesh,
                shard=shard_mode, render_kwargs=rkw,
            )
        else:
            step = make_train_step(
                model, tx, cfg, args.sh_degree, backend=backend, render_kwargs=rkw
            )
        dp_step = (
            make_dp_train_step(model, tx, cfg, args.sh_degree, dp_mesh, backend=backend)
            if dp_mesh is not None
            else None
        )
        return step, dp_step

    step_fn, dp_step_fn = build_step_fns(pair_capacity)
    eval_fn = make_eval_render(model, args.sh_degree, backend=backend)

    bg_color = jnp.ones(3) if args.white_background else jnp.zeros(3)
    rng = random.Random(args.seed)
    np_rng = np.random.default_rng(args.seed)
    key = jax.random.key(args.seed)

    from ..utils.profiling import MetricsLogger
    from . import network_gui

    # Pin every GT image to DEVICE memory up front: re-uploading a 800x800
    # float image per step costs more than the train step itself on a
    # tunneled TPU (~7.7 MB/step; measured ~6x step slowdown at scale).
    # The reference re-uploads per iteration (train.py .cuda() each step);
    # HBM is large enough to do better — 100 cameras at 800x800 is 0.77 GB.
    # Fall back to host arrays if the dataset would not fit (~1/4 of HBM).
    gt_bytes = sum(np.asarray(g).nbytes for _, g in scene.train_cameras)
    if gt_bytes <= 4 << 30:
        cams = [(c, jnp.asarray(g)) for c, g in scene.train_cameras]
    else:
        cams = scene.train_cameras
    order: list[int] = []
    logger = MetricsLogger(args.model_path, tensorboard=True)
    t_start = time.time()
    t_boundary = time.time()
    ema_loss = None
    if args.port:
        network_gui.init(args.ip, args.port)
    profile_range = None
    if args.profile_steps:
        lo, hi = args.profile_steps.split(":")
        profile_range = (int(lo), int(hi))

    if args.save_xyz:
        os.makedirs(os.path.join(args.model_path, "xyz"), exist_ok=True)

    # Overflow watch: metrics stay device-side (async dispatch); reading a
    # value K steps old costs no sync because the device finished it long
    # ago. Capacity therefore grows within K steps of the FIRST dropped
    # pair instead of at the next %100 logging boundary (VERDICT r3 #6).
    from collections import deque
    overflow_lag = deque()
    OVERFLOW_LAG_STEPS = 8

    start_iter = int(tstate.step)
    it_boundary = start_iter
    last_cam = None
    for it in range(start_iter + 1, cfg.iterations + 1):
        if args.save_xyz and (it % 5000 == 1 or it == cfg.iterations):
            # reference train.py:62-64 (torch.save of get_xyz -> .npy here)
            bag = model.to_bag(tstate.model_state())
            np.save(os.path.join(args.model_path, "xyz", f"{it}.npy"),
                    np.asarray(bag.xyz))
        if profile_range and it == profile_range[0]:
            jax.profiler.start_trace(os.path.join(args.model_path, "xprof"))
        # GUI poll (reference train.py:65-79): while a viewer is connected,
        # serve frames; proceed to a training iteration only when the viewer
        # requests training (`do_training`) — unchecking "train" in the
        # viewer pauses optimization while rendering stays live.
        while args.port and network_gui.try_connect():
            try:
                msg = network_gui.receive()
                parsed = network_gui.parse_camera(msg) if msg else None
                do_training = True
                keep_alive = False
                img_bytes = None
                if parsed is not None:
                    gui_cam, do_training, keep_alive, scaling_mod = parsed
                    img = eval_fn(tstate, gui_cam, bg_color)
                    img_bytes = network_gui.image_to_bytes(np.asarray(img))
                network_gui.send(img_bytes, args.source_path)
                if do_training and (it <= cfg.iterations or not keep_alive):
                    break
            except Exception:
                network_gui.disconnect()
        if it % 1000 == 0:
            tstate = one_up_sh_degree(tstate, args.sh_degree)
        bg = jnp.asarray(np_rng.random(3), jnp.float32) if cfg.random_background else bg_color
        # steps dispatch asynchronously — no host sync here; floats are
        # pulled from `metrics` only at the logging boundary below, so the
        # device keeps multiple steps in flight (VERDICT r2 ask #7)
        # keep the PRE-step state alive for --detect_anomaly: the debug dump
        # must contain the inputs that produced a non-finite loss, not the
        # already-poisoned post-update params (ref snapshot_fw/bw semantics)
        prev_tstate = tstate
        if n_dp > 1:
            picked = []
            while len(picked) < n_dp:
                if not order:
                    order = list(range(len(cams)))
                    rng.shuffle(order)
                picked.append(order.pop())
            from ..core.camera import stack_cameras

            cam_batch = stack_cameras([cams[i][0] for i in picked])
            gt_batch = jnp.stack([jnp.asarray(cams[i][1]) for i in picked])
            tstate, metrics = dp_step_fn(tstate, cam_batch, gt_batch, bg)
            last_cam = cam_batch
        else:
            if not order:
                order = list(range(len(cams)))
                rng.shuffle(order)
            cam, gt = cams[order.pop()]
            tstate, metrics = step_fn(tstate, cam, jnp.asarray(gt), bg)
            last_cam = cam

        # delayed-read overflow watch (no pipeline stall; see deque above)
        if pair_capacity is not None and "overflow" in metrics:
            overflow_lag.append(metrics["overflow"])
            if len(overflow_lag) > OVERFLOW_LAG_STEPS:
                if int(overflow_lag.popleft()) > 0:
                    pair_capacity *= 2
                    print(f"[it {it}] rasterizer pair overflow — growing "
                          f"pair_capacity to {pair_capacity}")
                    step_fn, dp_step_fn = build_step_fns(pair_capacity)
                    overflow_lag.clear()
            if it == cfg.iterations:
                # drain the whole lag window so overflow in the final steps
                # is at least reported (growing here would be pointless)
                tail_overflow = sum(int(o) for o in overflow_lag)
                overflow_lag.clear()
                if tail_overflow > 0:
                    print(f"[it {it}] WARNING: pair overflow in the final "
                          f"{OVERFLOW_LAG_STEPS} steps ({tail_overflow} "
                          f"dropped pairs) — those renders were truncated")

        if args.detect_anomaly and not np.isfinite(float(metrics["loss"])):
            dump = dump_debug_state(args.model_path, it, prev_tstate, last_cam)
            raise RuntimeError(
                f"non-finite loss at iteration {it}; step inputs dumped to {dump}"
            )
        if profile_range and it == profile_range[1]:
            jax.profiler.stop_trace()
            profile_range = None

        if densify and it < cfg.densify_until_iter:
            if it > cfg.densify_from_iter and it % cfg.densification_interval == 0:
                size_threshold = 20.0 if it > cfg.opacity_reset_interval else 0.0
                key, sub = jax.random.split(key)
                tstate, info = densify_and_prune(
                    tstate, sub,
                    grad_threshold=cfg.densify_grad_threshold,
                    min_opacity=cfg.min_opacity,
                    extent=scene.cameras_extent,
                    percent_dense=cfg.percent_dense,
                    size_threshold=size_threshold,
                    scaling_cols=2 if args.gs_type == "gs_flat" else 3,
                )
                if not args.quiet and int(info["overflow"]) > 0:
                    print(f"[it {it}] densify overflow: {int(info['overflow'])} dropped")
                n_pruned = int(info["n_pruned"])
                if not args.quiet and n_pruned > 0.5 * max(int(info["n_alive"]), 1):
                    print(
                        f"[it {it}] WARNING: densify pruned {n_pruned} "
                        f"(opacity {int(info['n_pruned_opacity'])}, "
                        f"screen {int(info['n_pruned_screen'])}, "
                        f"world {int(info['n_pruned_world'])}) — "
                        f"{int(info['n_alive'])} alive"
                    )
            if it % cfg.opacity_reset_interval == 0 or (
                args.white_background and it == cfg.densify_from_iter
            ):
                tstate = reset_opacity(tstate)

        if it % 100 == 0 or it == 1:
            # the ONLY per-loop host sync: pull this step's metrics
            loss = float(metrics["loss"])
            ema_loss = loss if ema_loss is None else 0.6 * loss + 0.4 * ema_loss
            iter_ms = (time.time() - t_boundary) / max(it - it_boundary, 1) * 1000
            t_boundary, it_boundary = time.time(), it
            if not args.quiet:
                print(f"[it {it}/{cfg.iterations}] loss {ema_loss:.5f} "
                      f"psnr {float(metrics['psnr']):.2f} "
                      f"iter {iter_ms:.1f}ms "
                      f"({(time.time()-t_start):.0f}s)")
            if not np.isfinite(loss):
                dump = dump_debug_state(args.model_path, it, prev_tstate, last_cam)
                raise RuntimeError(
                    f"non-finite loss at iteration {it}; step inputs dumped "
                    f"to {dump} (re-run with --detect_anomaly to catch the "
                    f"step that produced it)"
                )
            overflow = int(metrics.get("overflow", 0))
            if it % 100 == 0:
                logger.scalar("train_loss_patches/total_loss", loss, it)
                logger.scalar("train_loss_patches/l1_loss", float(metrics["l1"]), it)
                logger.scalar("iter_time", iter_ms, it)
                logger.scalar("rasterizer/pair_overflow", overflow, it)
                logger.scalar("total_points", float(np.asarray(tstate.alive).sum()), it)

        if it in args.test_iterations and scene.test_cameras:
            vals = []
            for idx, (tc, tgt) in enumerate(scene.test_cameras):
                img = eval_fn(tstate, tc, bg_color)
                vals.append(float(psnr(img, jnp.asarray(tgt))))
                if idx < 5:
                    logger.image(f"test_view_{idx}/render", np.asarray(img), it)
            test_psnr = float(np.mean(vals))
            print(f"[it {it}] eval: test PSNR {test_psnr:.2f}")
            logger.scalar("test/psnr", test_psnr, it)
            logger.histogram("scene/opacity_histogram",
                             jax.nn.sigmoid(tstate.params["opacity"]), it)
            logger.flush()

        if it in args.save_iterations:
            out_dir = snapshot_dir(args.model_path, it)
            save_snapshot(args.gs_type, model, tstate.model_state(), out_dir)
            print(f"[it {it}] saved snapshot to {out_dir}")

        if it in args.checkpoint_iterations:
            save_checkpoint(os.path.join(args.model_path, f"chkpnt{it}"), tstate)
            print(f"[it {it}] checkpoint saved")

    # final snapshot if not already saved
    if cfg.iterations not in args.save_iterations:
        save_snapshot(args.gs_type, model, tstate.model_state(),
                      snapshot_dir(args.model_path, cfg.iterations))
    logger.close()
    print(f"training done in {time.time()-t_start:.0f}s")
    return tstate


if __name__ == "__main__":
    main()
