"""Multi-host initialization + scaling-efficiency measurement harness.

The reference is strictly single-process/single-GPU (SURVEY.md §2.3); on
TPU pods, training scales by camera data-parallelism: every host loads its
own camera shard (host-local IO), the `data` mesh axis spans all chips,
and gradient psums ride ICI within a slice / DCN across slices.

Usage on each pod worker:

    from gaussian_mesh_splatting_tpu.parallel import multihost
    multihost.initialize()              # jax.distributed under the hood
    mesh = multihost.global_mesh()      # 1-D 'data' mesh over all chips

For manual clusters (e.g. CPU multi-process tests), pass the coordinator
explicitly:

    multihost.initialize(coordinator_address="host0:1234",
                         num_processes=2, process_id=rank)

The scaling benchmark (`measure_scaling`) times the DP step at several
mesh widths and reports pixels/s and parallel efficiency — the ≥80%
multi-host target of BASELINE.md.
"""
from __future__ import annotations

import os
import time

import numpy as np

_initialized = False

# Environment markers from which jax.distributed can autodetect a cluster
# (cloud TPU pod metadata, SLURM, Open MPI, or an explicit coordinator).
_CLUSTER_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "SLURM_JOB_NUM_NODES",
    "OMPI_COMM_WORLD_SIZE",
    "TPU_WORKER_HOSTNAMES",
    "MEGASCALE_COORDINATOR_ADDRESS",
)


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    **kwargs,
) -> bool:
    """Start the JAX distributed runtime (idempotent).

    MUST run before anything touches the JAX backend (`jax.devices()`,
    `jax.process_count()`, any computation) — probing the backend first
    instantiates a local-only client and `jax.distributed.initialize`
    can no longer attach the remote devices.

    With explicit arguments (or a cluster environment, detected via the
    env markers above) this calls `jax.distributed.initialize` and lets
    errors propagate — a multi-host launch that cannot initialize must
    fail loudly, not silently fall back to 1/N of the job. With no
    arguments on a plain single-host machine it is a documented no-op.

    Returns True when the distributed runtime was (or already is) up.
    """
    global _initialized
    import jax

    if _initialized:
        return True

    explicit = (
        coordinator_address is not None
        or num_processes is not None
        or process_id is not None
        or bool(kwargs)
    )
    in_cluster = any(os.environ.get(v) for v in _CLUSTER_ENV_VARS)
    # a single-entry worker list is a single-host run, not a cluster (the
    # axon TPU plugin exports TPU_WORKER_HOSTNAMES=localhost on one-chip
    # boxes; initializing distributed there demands a coordinator address)
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES")
    if (
        in_cluster
        and hostnames is not None
        and len([h for h in hostnames.split(",") if h]) <= 1
        and not any(
            os.environ.get(v) for v in _CLUSTER_ENV_VARS
            if v != "TPU_WORKER_HOSTNAMES"
        )
    ):
        in_cluster = False
    if not explicit and not in_cluster:
        return False  # plain single-host run: nothing to do

    if coordinator_address is None:
        coordinator_address = os.environ.get(
            "JAX_COORDINATOR_ADDRESS"
        ) or os.environ.get("COORDINATOR_ADDRESS")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    _initialized = True
    return True


def is_initialized() -> bool:
    return _initialized


def global_mesh(axis_name: str = "data"):
    """1-D mesh over every chip in the job (all hosts)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis_name,))


def measure_scaling(step_builder, widths=None, iters: int = 10) -> dict:
    """Time a DP step at several device counts.

    Args:
      step_builder: fn(mesh) -> (step_fn, args) where step_fn(*args) returns
        something blockable; args sized for the mesh width.
      widths: device counts to test (default 1, 2, ..., all).
    Returns:
      {width: {"ms": mean step ms, "efficiency": vs linear scaling}}
    """
    import jax
    from jax.sharding import Mesh

    n = jax.device_count()
    if widths is None:
        widths = [w for w in (1, 2, 4, 8, 16, 32, 64) if w <= n]
        if n not in widths:
            widths.append(n)
    results = {}
    base_ms = None
    for w in widths:
        mesh = Mesh(np.asarray(jax.devices()[:w]), ("data",))
        step_fn, args = step_builder(mesh)
        out = step_fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step_fn(*args)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / iters * 1000
        if base_ms is None:
            base_ms = ms
        # per-step work grows with width (w cameras) => ideal time constant
        results[w] = {"ms": ms, "efficiency": base_ms / ms}
    return results
