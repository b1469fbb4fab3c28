"""Subprocess worker for the 2-process multihost test (not a pytest file).

Each process: initialize the JAX distributed runtime FIRST (before any
backend touch), build the global mesh, run ONE camera-DP train step with
its own local camera shard, and print the psum'd loss — the parent asserts
both ranks saw the same global loss and that process/device counts were
truly 2-process global.

Usage: python multihost_worker.py <rank> <nprocs> <coordinator>
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# one CPU device per process => device_count == num_processes
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

rank, nprocs, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

import jax  # noqa: E402

# the image's sitecustomize pins the axon TPU platform via jax config, which
# overrides JAX_PLATFORMS — flip it back the same way (as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
# cross-process CPU collectives need the gloo backend
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from gaussian_mesh_splatting_tpu.parallel import multihost  # noqa: E402

ok = multihost.initialize(
    coordinator_address=coord, num_processes=nprocs, process_id=rank
)
assert ok and multihost.is_initialized()
assert jax.process_count() == nprocs, jax.process_count()
assert jax.device_count() == nprocs, jax.devices()
assert jax.local_device_count() == 1

import math  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from gaussian_mesh_splatting_tpu.core import make_camera, stack_cameras  # noqa: E402
from gaussian_mesh_splatting_tpu.models import flat  # noqa: E402
from gaussian_mesh_splatting_tpu.parallel import make_dp_train_step  # noqa: E402
from gaussian_mesh_splatting_tpu.renderer import render  # noqa: E402
from gaussian_mesh_splatting_tpu.train import (  # noqa: E402
    make_train_state,
    optimization_config,
)

mesh = multihost.global_mesh()
assert mesh.devices.size == nprocs

# tiny deterministic scene, identical on both ranks
n = 16
key = jax.random.key(0)
pts = jax.random.normal(key, (n, 3)) * 0.3
state0 = flat.init_from_points(pts, jnp.full((n, 3), 0.5), sh_degree=0)
cfg = optimization_config("gs_flat")
tstate, tx = make_train_state("gs_flat", state0, cfg)
bg = jnp.zeros(3)


def cam_at(i):
    a = 2 * math.pi * i / nprocs
    Rz = np.array(
        [[math.cos(a), -math.sin(a), 0], [math.sin(a), math.cos(a), 0], [0, 0, 1]],
        np.float32,
    )
    return make_camera(Rz, np.array([0.0, 0.0, 3.0]), 0.8, 0.8, 16, 16)


cams = [cam_at(i) for i in range(nprocs)]
gts = [
    render(flat.to_bag(state0), c, bg, sh_degree=0, backend="reference").image
    for c in cams
]

# build GLOBAL arrays: replicated state/bg, camera batch sharded over 'data'
repl = NamedSharding(mesh, P())
shard = NamedSharding(mesh, P("data"))
tstate = jax.tree.map(lambda x: jax.device_put(x, repl), tstate)
bg = jax.device_put(bg, repl)
cam_batch = jax.tree.map(
    lambda leaf: jax.make_array_from_process_local_data(
        shard, np.asarray(leaf)[rank : rank + 1]
    ),
    stack_cameras(cams),
)
gt_batch = jax.make_array_from_process_local_data(
    shard, np.asarray(gts[rank])[None]
)

step = make_dp_train_step(flat, tx, cfg, 0, mesh, backend="reference")
new_state, metrics = step(tstate, cam_batch, gt_batch, bg)

loss = float(metrics["loss"].addressable_data(0))
delta = float(
    np.abs(
        np.asarray(new_state.params["xyz"].addressable_data(0))
        - np.asarray(tstate.params["xyz"].addressable_data(0))
    ).max()
)
print(
    "RESULT "
    + json.dumps(
        {
            "rank": rank,
            "process_count": jax.process_count(),
            "device_count": jax.device_count(),
            "loss": loss,
            "param_delta": delta,
        }
    ),
    flush=True,
)
