"""Device-mesh construction for multi-chip / multi-host training.

The reference has no distributed execution at all (SURVEY.md §2.3); this
is net-new TPU-native design: one `jax.sharding.Mesh` with a `data` axis
for camera parallelism (the per-step unit of work in the reference is one
random camera, train.py:90-92). Single-chip runs are the degenerate 1-axis
mesh, so all call sites are uniform.

Multi-host: call `jax.distributed.initialize()` before `create_mesh`; each
host feeds its local camera shard (`local_batch_slice`) and XLA's psum
rides ICI within slices / DCN across.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def create_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def create_mesh2d(
    n_data: int,
    n_model: int,
    axis_names: tuple[str, str] = ("data", "model"),
) -> Mesh:
    """2-D (data x model) mesh for composed camera-DP x sharded-render
    training (parallel/sharded_step.py). The model axis is the FAST axis so
    one camera's portion collectives ride adjacent devices."""
    devices = np.asarray(jax.devices()[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devices, axis_names)


def local_batch_slice(global_batch: int, mesh: Mesh) -> tuple[int, int]:
    """(start, size) of this host's shard of a camera batch."""
    n_total = mesh.devices.size
    n_local = len([d for d in mesh.devices.flat if d.process_index == jax.process_index()])
    per = global_batch // n_total
    start = jax.process_index() * n_local * per
    return start, n_local * per
