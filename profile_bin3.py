"""Stage-bisect of the CURRENT build_aligned_binning (32x32 tiles, analytic
counts, single stable sort) at bench size, on the real chip."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_mesh_splatting_tpu.core import make_camera
from gaussian_mesh_splatting_tpu.models.gaussian_bag import GaussianBag
from gaussian_mesh_splatting_tpu.ops.binning import (
    _analytic_tile_counts,
    _rank_in_sorted,
    tile_rect,
)
from gaussian_mesh_splatting_tpu.ops import rasterize_pallas as rp
from gaussian_mesh_splatting_tpu.ops.projection import preprocess

n = 100_000
width = height = 800
TILE_H, TILE_W = rp.TILE_H, rp.TILE_W
n_tiles_y, n_tiles_x = 25, 25
n_tiles = 625
pair_capacity = rp.default_pair_capacity(n, n_tiles)
chunk = 128

k = jax.random.split(jax.random.key(0), 6)
xyz = jax.random.normal(k[0], (n, 3)) * 0.5
scales_log = jax.random.normal(k[1], (n, 3)) * 0.3 - 3.5
q = jax.random.normal(k[2], (n, 4))
opacity_raw = jax.random.normal(k[3], (n, 1))
shs = jnp.concatenate(
    [jax.random.uniform(k[4], (n, 3, 1)) * 2 - 0.5,
     jax.random.normal(k[5], (n, 3, 15)) * 0.01], axis=-1)
cam = make_camera(np.eye(3), np.array([0.0, 0.0, 4.0]), 0.8, 0.8, width, height)


def prep(_):
    bag = GaussianBag(
        xyz=xyz, scaling=jnp.exp(scales_log),
        rotation=q / jnp.linalg.norm(q, axis=-1, keepdims=True),
        opacity=jax.nn.sigmoid(opacity_raw), shs=shs,
        alive=jnp.ones((n,), bool))
    return preprocess(bag.xyz, bag.scaling, bag.rotation, bag.opacity, cam,
                      shs=bag.shs, sh_degree=3, alive=bag.alive)


def staged(stage):
    def f(_):
        proj = jax.lax.stop_gradient(prep(_))
        dorder = jnp.argsort(
            jnp.where(proj.valid, proj.depth, jnp.inf), stable=True
        ).astype(jnp.int32)
        mean2d_s = jnp.take(proj.mean2d, dorder, axis=0)
        rx = proj.radius if proj.radius_x is None else proj.radius_x
        ry = proj.radius if proj.radius_y is None else proj.radius_y
        rx_s = jnp.take(rx, dorder, axis=0)
        ry_s = jnp.take(ry, dorder, axis=0)
        valid_s = jnp.take(proj.valid, dorder, axis=0)
        xmin, xmax, ymin, ymax = tile_rect(
            mean2d_s, rx_s, TILE_H, TILE_W, n_tiles_y, n_tiles_x, 0, radius_y=ry_s)
        sx = jnp.maximum(xmax - xmin, 0)
        sy = jnp.maximum(ymax - ymin, 0)
        span = jnp.where(valid_s, sx * sy, 0)
        offsets = jnp.cumsum(span) - span
        total = offsets[-1] + span[-1]
        if stage == 0:
            return offsets, total
        p = jnp.arange(pair_capacity, dtype=jnp.int32)
        g = _rank_in_sorted(offsets, pair_capacity).astype(jnp.int32) - 1
        g = jnp.clip(g, 0, n - 1)
        if stage == 1:
            return g
        table = jnp.stack([offsets, xmin, ymin, sx], axis=1)
        table, g = jax.lax.optimization_barrier((table, g))
        rows = table[g]
        off_g = rows[:, 0]
        xmin_g, ymin_g, sx_g = rows[:, 1], rows[:, 2], rows[:, 3]
        local = p - off_g
        pvalid = p < total
        sxm = jnp.maximum(sx_g, 1)
        lrow = jnp.floor(
            (local.astype(jnp.float32) + 0.5) / sxm.astype(jnp.float32)
        ).astype(jnp.int32)
        tx = xmin_g + (local - lrow * sxm)
        ty = ymin_g + lrow
        tile = jnp.where(pvalid, ty * n_tiles_x + tx, n_tiles).astype(jnp.int32)
        gg = jnp.where(pvalid, g, n)
        tile, gg = jax.lax.optimization_barrier((tile, gg))
        if stage == 2:
            return tile, gg
        span_eff = jnp.clip(pair_capacity - offsets, 0, span)
        counts = _analytic_tile_counts(
            xmin, ymin, sx, sy, span_eff, n_tiles_y, n_tiles_x)
        pad = (-counts) % chunk
        padded_counts = counts + pad
        aligned_start = (jnp.cumsum(padded_counts) - padded_counts).astype(jnp.int32)
        if stage == 3:
            return counts, aligned_start
        n_pad_slots = n_tiles * chunk
        pad_off = jnp.cumsum(pad) - pad
        total_pad = pad_off[-1] + pad[-1]
        j = jnp.arange(n_pad_slots, dtype=jnp.int32)
        t_pad = _rank_in_sorted(pad_off, n_pad_slots).astype(jnp.int32) - 1
        t_pad = jnp.clip(t_pad, 0, n_tiles - 1)
        ptable = jnp.stack([pad_off, pad], axis=1)
        ptable, t_pad = jax.lax.optimization_barrier((ptable, t_pad))
        prows = ptable[t_pad]
        pad_ok = (j < total_pad) & ((j - prows[:, 0]) < prows[:, 1])
        tile_pad = jnp.where(pad_ok, t_pad, n_tiles).astype(jnp.int32)
        tile_all = jnp.concatenate([tile, tile_pad])
        g_all = jnp.concatenate([gg, jnp.full((n_pad_slots,), n, jnp.int32)])
        if stage == 4:
            return tile_all, g_all, aligned_start
        iota_all = jnp.arange(tile_all.shape[0], dtype=jnp.int32)
        _, sorted_g, sorted_slot = jax.lax.sort(
            (tile_all, g_all, iota_all), num_keys=1, is_stable=True)
        return sorted_g, sorted_slot, aligned_start, counts
    return f


def bench(f, name, iters=20):
    ff = jax.jit(f)
    o = ff(0)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = ff(0)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.2f} ms")


bench(prep, "prep")
for s, name in [(0, "span+cumsum"), (1, "+rank"), (2, "+decode"),
                (3, "+analytic counts"), (4, "+pad synth"), (5, "+sort")]:
    bench(staged(s), f"stage {name}")
