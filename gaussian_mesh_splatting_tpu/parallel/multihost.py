"""Multi-host initialization + scaling-efficiency measurement harness.

The reference is strictly single-process/single-GPU (SURVEY.md §2.3); on
TPU pods, training scales by camera data-parallelism: every host loads its
own camera shard (host-local IO), the `data` mesh axis spans all chips,
and gradient psums ride ICI within a slice / DCN across slices.

Usage on each pod worker:

    from gaussian_mesh_splatting_tpu.parallel import multihost
    multihost.initialize()              # jax.distributed under the hood
    mesh = multihost.global_mesh()      # 1-D 'data' mesh over all chips

The scaling benchmark (`measure_scaling`) times the DP step at several
mesh widths and reports pixels/s and parallel efficiency — the ≥80%
multi-host target of BASELINE.md.
"""
from __future__ import annotations

import time

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(**kwargs) -> None:
    """jax.distributed.initialize with env-based autodetection; no-op when
    single-process."""
    if jax.process_count() > 1 or kwargs:
        return  # already initialized
    try:
        jax.distributed.initialize(**kwargs)
    except Exception:
        pass  # single-host


def global_mesh(axis_name: str = "data") -> Mesh:
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
