"""K-nearest-neighbor mean distance, the TPU-native replacement for the
reference's `simple_knn._C.distCUDA2` (used once at init to set Gaussian
scales: scene/gaussian_model.py:134-135).

`distCUDA2(points)` returns, per point, the mean *squared* distance to its 3
nearest neighbors. Precision only matters as an init heuristic (SURVEY.md
§2.2), so a chunked brute-force top-k — which XLA maps well onto the MXU as
a big distance matmul — is the right tool up to a few hundred thousand
points.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def mean_knn_sq_dist(points: jax.Array, k: int = 3, chunk: int = 4096) -> jax.Array:
    """Per-point mean squared distance to the k nearest neighbors.

    Args:
      points: (N, 3) float32.
      k: neighbor count (3 matches distCUDA2).
      chunk: query chunk size (controls the (chunk, N) distance tile).
    Returns:
      (N,) mean of squared distances to the k nearest other points.
    """
    n = points.shape[0]
    sq = jnp.sum(points * points, axis=-1)  # (N,)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    pts_pad = jnp.pad(points, ((0, pad), (0, 0)))
    idx_pad = jnp.arange(n_chunks * chunk)

    def body(carry, i):
        start = i * chunk
        q = jax.lax.dynamic_slice(pts_pad, (start, 0), (chunk, 3))
        q_idx = jax.lax.dynamic_slice(idx_pad, (start,), (chunk,))
        # squared distances via the matmul identity |a-b|^2 = |a|^2+|b|^2-2ab
        d2 = (
            jnp.sum(q * q, axis=-1)[:, None]
            + sq[None, :]
            - 2.0 * q @ points.T
        )  # (chunk, N)
        # exclude self-distance
        self_mask = q_idx[:, None] == jnp.arange(n)[None, :]
        d2 = jnp.where(self_mask, jnp.inf, d2)
        neg_top, _ = jax.lax.top_k(-d2, k)
        mean_k = jnp.mean(jnp.maximum(-neg_top, 0.0), axis=-1)
        return carry, mean_k

    _, out = jax.lax.scan(body, None, jnp.arange(n_chunks))
    return out.reshape(-1)[:n]


def knn_scale_init(points: jax.Array, clamp_min: float = 1e-7) -> jax.Array:
    """log(sqrt(mean 3-NN squared distance)) — the reference's isotropic
    scale init (scene/gaussian_model.py:134-135). Returns (N,)."""
    d2 = jnp.maximum(mean_knn_sq_dist(points, k=3), clamp_min)
    return jnp.log(jnp.sqrt(d2))
