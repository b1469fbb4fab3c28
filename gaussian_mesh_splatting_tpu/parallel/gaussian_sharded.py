"""Gaussian-sharded rendering: partition the GAUSSIANS across the mesh and
merge per-device partial composites in depth order — the third parallel
axis of SURVEY.md §2.3 (model-parallel over splats), the one that scales
millions-of-Gaussians scenes past a single chip's HBM.

Design (TPU-first, no per-pixel sorting across devices):
  1. Sort Gaussians by view-space depth ONCE (an N-sized argsort in XLA)
     and deal CONTIGUOUS depth ranges to devices. Front-to-back alpha
     compositing is associative over ordered groups: with per-group
     pre-background color C_i and transmittance T_i,
         C = sum_i (prod_{j<i} T_j) * C_i,   T = prod_i T_i
     (the over-operator's group form), so each device composites only its
     own depth slab locally and the cross-device merge is an exclusive
     cumprod + weighted sum — one all_gather of (D, H, W, 4) per image,
     riding ICI, instead of any cross-device per-pair traffic.
  2. Within a slab the Pallas rasterizer runs unchanged (its own binning
     and per-tile depth order); `bg=0` makes its output the slab's
     pre-background partial.

Exactness: matches the unsharded render up to the early-termination tail.
The termination rule stops a pixel when the NEXT pair would push T below
T_EPS=1e-4 — i.e. when T*(1-alpha) < 1e-4 — WITHOUT compositing that pair,
so the unsharded walk can discard up to T_EPS/(1-ALPHA_MAX) = 1e-2 of
remaining weight at a pixel whose terminator is near-opaque (alpha clamps
at 0.99). Slab boundaries reset the local termination check, so the
sharded render picks up part of that discarded tail: the per-pixel
difference is bounded by the weight the unsharded walk discarded
(<= 1e-2 worst case; measured ~1e-3 max on a dense saturating scene,
tests/test_parallel.py::test_gaussian_sharded_matches_full_at_scale...).
Pixels that never saturate match to reassociation tolerance. Same
termination order as the reference CUDA kernel's per-pixel cutoff
(renderer/gaussian_renderer/__init__.py:94-102).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.camera import Camera
from ..models.gaussian_bag import GaussianBag
from ..ops.rasterize_pallas import rasterize_pallas


def _depth_order(bag: GaussianBag, cam: Camera) -> jax.Array:
    """Indices sorting Gaussians front-to-back in view space (dead last)."""
    wv = cam.world_view
    z = bag.xyz @ wv[2, :3] + wv[2, 3]
    z = jnp.where(bag.alive, z, jnp.inf)  # dead splats sort to the back
    return jnp.argsort(z)


def render_gaussian_sharded(
    bag: GaussianBag,
    cam: Camera,
    bg: jax.Array,
    mesh: Mesh,
    *,
    sh_degree: int = 3,
    axis_name: str = "data",
    interpret: bool | None = None,
    pair_capacity: int | None = None,
) -> jax.Array:
    """Render one camera with the Gaussians sharded over the mesh.

    Each device composites a contiguous depth slab of ceil(N/D) splats;
    slabs merge by the ordered over-compositing identity above. Returns
    the assembled (H, W, 3) image (replicated)."""
    n_dev = mesh.devices.size
    n = bag.xyz.shape[0]
    per = -(-n // n_dev)
    order = _depth_order(bag, cam)
    pad = per * n_dev - n
    if pad:
        # pad with repeats of the last (dead/farthest) index, masked dead
        order = jnp.concatenate([order, jnp.full((pad,), order[-1], order.dtype)])
    alive = jnp.take(bag.alive, order)
    if pad:
        alive = alive.at[n:].set(False)
    sorted_bag = GaussianBag(
        xyz=jnp.take(bag.xyz, order, axis=0),
        scaling=jnp.take(bag.scaling, order, axis=0),
        rotation=jnp.take(bag.rotation, order, axis=0),
        opacity=jnp.take(bag.opacity, order, axis=0),
        shs=jnp.take(bag.shs, order, axis=0),
        alive=alive,
    )

    def shard_fn(slab: GaussianBag):
        out = rasterize_pallas(
            slab.xyz,
            slab.scaling,
            slab.rotation,
            slab.opacity,
            cam,
            bg=jnp.zeros((3,), jnp.float32),  # partials are pre-background
            shs=slab.shs,
            sh_degree=sh_degree,
            alive=slab.alive,
            interpret=interpret,
            pair_capacity=pair_capacity,
        )
        t = 1.0 - out.alpha  # slab transmittance
        part = jnp.concatenate([out.image, t[..., None]], axis=-1)
        return part[None]  # (1, H, W, 4)

    parts = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis_name),),
        out_specs=P(axis_name),
        check_vma=False,
    )(sorted_bag)  # (D, H, W, 4), slab d = depth ranks [d*per, (d+1)*per)

    color = parts[..., :3]
    t = parts[..., 3]
    # exclusive front-to-back transmittance prefix: weight of slab i is the
    # product of all nearer slabs' transmittances
    t_excl = jnp.concatenate(
        [jnp.ones_like(t[:1]), jnp.cumprod(t[:-1], axis=0)], axis=0
    )
    image = jnp.sum(t_excl[..., None] * color, axis=0)
    t_total = t_excl[-1] * t[-1]
    return image + t_total[..., None] * bg
