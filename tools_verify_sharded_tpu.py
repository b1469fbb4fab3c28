"""Gaussian-sharded rendering on the REAL Pallas backend (TPU).

The CPU suite proves the depth-slab merge on the 8-device virtual mesh in
interpret mode (tests/test_parallel.py); this drives the same
`render_gaussian_sharded` / `render_row_sharded` paths through the REAL
Mosaic kernels on a single-device mesh (the only mesh this box has) and
compares against the unsharded Pallas render — the sharding machinery
(shard_map, all_gather/merge, slab slicing) runs for real, the collective
is a self-gather. Appends a `sharded_tpu` section to VERIFY_r4.json.

Usage: python tools_verify_sharded_tpu.py [VERIFY_r4.json]
"""
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gaussian_mesh_splatting_tpu.core import make_camera
from gaussian_mesh_splatting_tpu.models.gaussian_bag import GaussianBag
from gaussian_mesh_splatting_tpu.ops.rasterize_pallas import rasterize_pallas
from gaussian_mesh_splatting_tpu.parallel import (
    create_mesh,
    render_gaussian_sharded,
    render_row_sharded,
)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "VERIFY_r4.json"
    assert jax.default_backend() == "tpu", "run on the TPU box"
    n = 20_000
    width = height = 512
    k = jax.random.split(jax.random.key(7), 6)
    bag = GaussianBag(
        xyz=jax.random.normal(k[0], (n, 3)) * 0.5,
        scaling=jnp.exp(jax.random.normal(k[1], (n, 3)) * 0.3 - 3.2),
        rotation=jax.random.normal(k[2], (n, 4)),
        opacity=jax.nn.sigmoid(jax.random.normal(k[3], (n, 1))),
        shs=jnp.concatenate(
            [jax.random.uniform(k[4], (n, 3, 1)) * 2 - 0.5,
             jax.random.normal(k[5], (n, 3, 15)) * 0.01], axis=-1),
        alive=jnp.ones((n,), bool),
    )
    bag = bag.replace(
        rotation=bag.rotation / jnp.linalg.norm(bag.rotation, axis=-1,
                                                keepdims=True))
    cam = make_camera(np.eye(3), np.array([0.0, 0.0, 4.0]), 0.8, 0.8,
                      width, height)
    bg = jnp.array([0.1, 0.2, 0.3])

    full = jax.jit(lambda: rasterize_pallas(
        bag.xyz, bag.scaling, bag.rotation, bag.opacity, cam,
        bg=bg, shs=bag.shs, sh_degree=3, alive=bag.alive).image)()
    mesh = create_mesh()
    report = {"backend": "pallas/tpu", "n_gaussians": n,
              "image": [height, width], "mesh_devices": int(mesh.devices.size)}
    for name, fn in (("gaussian_sharded", render_gaussian_sharded),
                     ("row_sharded", render_row_sharded)):
        img = jax.jit(lambda fn=fn: fn(bag, cam, bg, mesh, sh_degree=3))()
        diff = np.abs(np.asarray(img) - np.asarray(full))
        report[name] = {"max_abs_diff_vs_unsharded": float(diff.max()),
                        "mean_abs_diff": float(diff.mean())}
        print(name, report[name])

    data = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            data = json.load(f)
    data["sharded_tpu"] = report
    with open(out_path, "w") as f:
        json.dump(data, f, indent=2)
    print("updated", out_path)


if __name__ == "__main__":
    main()
