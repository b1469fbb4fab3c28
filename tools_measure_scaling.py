"""Produce SCALING_r{N}.json: camera-DP scaling efficiency over mesh widths.

Runs `parallel.multihost.measure_scaling` on whatever devices are visible —
on a TPU pod slice that is real chips; on this box it is the 8-device
virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8), which
validates the DP step + collectives at every width. NOTE on the CPU
numbers: all 8 virtual devices share this machine's 2 physical cores, so
wall-clock "efficiency" on CPU is bounded by ~2/W for W virtual devices —
the artifact demonstrates the mechanism (per-width meshes, psum'd grads,
constant per-device work) rather than ICI bandwidth.

Usage: python tools_measure_scaling.py [out.json]
"""
import json
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
# force the virtual CPU mesh even under the axon sitecustomize, which pins
# JAX_PLATFORMS=axon (a 1-chip TPU cannot demonstrate width scaling); env
# alone does not stick once the plugin is registered — flip the config too
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
import jax  # noqa: E402  (before multihost so the config flip lands first)

jax.config.update("jax_platforms", "cpu")

from gaussian_mesh_splatting_tpu.parallel import multihost

# initialize() must run before anything touches the backend
multihost.initialize()

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_mesh_splatting_tpu.core import stack_cameras
from gaussian_mesh_splatting_tpu.core.camera import make_camera
from gaussian_mesh_splatting_tpu.models import flat
from gaussian_mesh_splatting_tpu.parallel import make_dp_train_step
from gaussian_mesh_splatting_tpu.train import make_train_state, optimization_config

WIDTH = HEIGHT = 64
N_GAUSS = 512


def _cameras(n):
    cams = []
    for i in range(n):
        angle = 2 * np.pi * i / max(n, 1)
        c = np.array([3 * np.sin(angle), 0.4, 3 * np.cos(angle)])
        fwd = -c / np.linalg.norm(c)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        true_up = np.cross(fwd, right)
        R = np.stack([right, true_up, fwd], axis=1)
        T = -R.T @ c
        cams.append(make_camera(R, T, 0.8, 0.8, WIDTH, HEIGHT))
    return cams


def step_builder(mesh):
    w = mesh.size
    k = jax.random.key(0)
    pts = jax.random.normal(k, (N_GAUSS, 3)) * 0.5
    state0 = flat.init_from_points(pts, jnp.full((N_GAUSS, 3), 0.5), sh_degree=0)
    cfg = optimization_config("gs_flat")
    tstate, tx = make_train_state("gs_flat", state0, cfg)
    step = make_dp_train_step(flat, tx, cfg, 0, mesh, backend="reference")
    cams = _cameras(w)
    cam_batch = stack_cameras(cams)
    gts = jnp.zeros((w, HEIGHT, WIDTH, 3))
    bg = jnp.zeros(3)

    def run(tstate, cam_batch, gts, bg):
        new_state, metrics = step(tstate, cam_batch, gts, bg)
        return metrics["loss"]

    return run, (tstate, cam_batch, gts, bg)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING_r3.json"
    results = multihost.measure_scaling(step_builder, iters=20)
    px_per_cam = WIDTH * HEIGHT
    report = {
        "workload": {
            "model": "gs_flat",
            "gaussians": N_GAUSS,
            "image": [HEIGHT, WIDTH],
            "cameras_per_device": 1,
            "backend": "reference (CPU virtual mesh)"
            if jax.default_backend() == "cpu"
            else jax.default_backend(),
        },
        "platform": jax.default_backend(),
        "physical_cpus": os.cpu_count(),
        "note": (
            "per-step work grows with width (1 camera/device); ideal scaling "
            "= constant step time. On the virtual CPU mesh all widths share "
            f"{os.cpu_count()} physical cores, so efficiency is bounded by "
            "~cores/width there; on real chips it reflects ICI overhead."
        ),
        "widths": {
            str(w): {
                "step_ms": r["ms"],
                "pixels_per_s": w * px_per_cam / (r["ms"] / 1000.0),
                "efficiency_vs_1": r["efficiency"],
            }
            for w, r in results.items()
        },
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["widths"], indent=2))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
