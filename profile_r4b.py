"""Bisect the new two-level binning vs the old rect binning, isolated."""
import importlib.util
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from gaussian_mesh_splatting_tpu.core import make_camera
from gaussian_mesh_splatting_tpu.ops import binning as B
from gaussian_mesh_splatting_tpu.ops.projection import preprocess
from gaussian_mesh_splatting_tpu.ops.rasterize_pallas import (
    TILE_H, TILE_W, default_pair_capacity,
)

spec = importlib.util.spec_from_file_location("old_binning", "/tmp/old_binning.py")
OLD = importlib.util.module_from_spec(spec)
spec.loader.exec_module(OLD)

n = 100_000
width = height = 800
k = jax.random.split(jax.random.key(0), 6)
xyz = jax.random.normal(k[0], (n, 3)) * 0.5
scales_log = jax.random.normal(k[1], (n, 3)) * 0.3 - 3.5
q = jax.random.normal(k[2], (n, 4))
opacity_raw = jax.random.normal(k[3], (n, 1))
shs = jnp.concatenate(
    [jax.random.uniform(k[4], (n, 3, 1)) * 2 - 0.5,
     jax.random.normal(k[5], (n, 3, 15)) * 0.01], axis=-1
)
cam = make_camera(np.eye(3), np.array([0.0, 0.0, 4.0]), 0.8, 0.8, width, height)
hp = -(-height // TILE_H) * TILE_H
wp = -(-width // TILE_W) * TILE_W
nty, ntx = hp // TILE_H, wp // TILE_W
cap = default_pair_capacity(n, nty * ntx)


def get_proj():
    return preprocess(
        xyz, jnp.exp(scales_log),
        q / jnp.linalg.norm(q, axis=-1, keepdims=True),
        jax.nn.sigmoid(opacity_raw), cam, shs=shs, sh_degree=3,
        radius_mode="tight",
    )


def timeit(f, iters=20):
    r = jax.block_until_ready(f())
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def run(fn):
    @jax.jit
    def g():
        return fn()
    return timeit(g)


def new_prefix(stage):
    proj = get_proj()
    row_capacity = B.default_row_capacity(cap)
    n_tiles = nty * ntx
    dorder = jnp.argsort(jnp.where(proj.valid, proj.depth, jnp.inf), stable=True).astype(jnp.int32)
    mean2d_s = jnp.take(proj.mean2d, dorder, axis=0)
    conic_s = jnp.take(proj.conic, dorder, axis=0)
    opac_s = jnp.take(proj.opacity, dorder, axis=0)
    rx_s = jnp.take(proj.radius_x, dorder, axis=0)
    ry_s = jnp.take(proj.radius_y, dorder, axis=0)
    valid_s = jnp.take(proj.valid, dorder, axis=0)
    xmin, xmax, ymin, ymax = B.tile_rect(
        mean2d_s, rx_s, TILE_H, TILE_W, nty, ntx, 0, radius_y=ry_s)
    sy = jnp.where(valid_s, jnp.maximum(ymax - ymin, 0), 0)
    if stage == "sort+rects":
        return sy.sum() + xmin.sum()
    row_off_g = jnp.cumsum(sy) - sy
    rows_total = row_off_g[-1] + sy[-1]
    mx, my = mean2d_s[:, 0], mean2d_s[:, 1]
    A, C_, Bc = conic_s[:, 0], conic_s[:, 2], conic_s[:, 1]
    t = jnp.maximum(2.0 * jnp.log(jnp.maximum(opac_s / B.ALPHA_MIN, 1.0)), 1e-6)
    inv_t = 1.0 / t
    As, Bs, Cs = A * inv_t, Bc * inv_t, C_ * inv_t
    ybase = ymin - row_off_g
    rtable = jnp.stack([ybase, xmin, xmax, B._bits(mx), B._bits(my),
                        B._bits(As), B._bits(Bs), B._bits(Cs)], axis=1)
    r_ids = jnp.arange(row_capacity, dtype=jnp.int32)
    gr = B._rank_in_sorted(row_off_g, row_capacity).astype(jnp.int32) - 1
    gr = jnp.clip(gr, 0, sy.shape[0] - 1)
    if stage == "rowrank":
        return gr.sum()
    rtable, gr = jax.lax.optimization_barrier((rtable, gr))
    rrows = rtable[gr]
    if stage == "rowgather":
        return rrows.sum()
    ty = r_ids + rrows[:, 0]
    rxmin, rxmax = rrows[:, 1], rrows[:, 2]
    rmx, rmy = B._unbits(rrows[:, 3]), B._unbits(rrows[:, 4])
    rA, rB, rC = B._unbits(rrows[:, 5]), B._unbits(rrows[:, 6]), B._unbits(rrows[:, 7])
    gy0 = ty * TILE_H
    ya = gy0.astype(jnp.float32) - rmy - 0.5
    yb = ya + jnp.float32(TILE_H)
    detc = jnp.maximum(rA * rC - rB * rB, 1e-20)
    ym = jnp.sqrt(rA / detc)
    slab_ok = (ya <= ym) & (yb >= -ym)
    ya_c = jnp.clip(ya, -ym, ym)
    yb_c = jnp.clip(yb, -ym, ym)
    dy_star = -rB / jnp.sqrt(jnp.maximum(rC * detc, 1e-30))
    dy_hi = jnp.clip(dy_star, ya_c, yb_c)
    dy_lo = jnp.clip(-dy_star, ya_c, yb_c)
    inv_A = 1.0 / rA
    s_hi = jnp.sqrt(jnp.maximum(rA - detc * dy_hi * dy_hi, 0.0))
    s_lo = jnp.sqrt(jnp.maximum(rA - detc * dy_lo * dy_lo, 0.0))
    x_hi = (-rB * dy_hi + s_hi) * inv_A + 0.5
    x_lo = (-rB * dy_lo - s_lo) * inv_A - 0.5
    inv_tw = 1.0 / jnp.float32(TILE_W)
    cx0 = jnp.maximum(rxmin, jnp.floor((rmx + x_lo) * inv_tw).astype(jnp.int32))
    cx1 = jnp.minimum(rxmax, jnp.floor((rmx + x_hi) * inv_tw).astype(jnp.int32) + 1)
    rvalid = (r_ids < rows_total) & slab_ok
    w = jnp.where(rvalid, jnp.maximum(cx1 - cx0, 0), 0)
    if stage == "spans":
        return w.sum()
    pair_off = jnp.cumsum(w) - w
    total = pair_off[-1] + w[-1]
    tstart = ty * ntx + cx0
    ptable = jnp.stack([pair_off, tstart, gr, jnp.zeros_like(gr)], axis=1)
    p = jnp.arange(cap, dtype=jnp.int32)
    rr = B._rank_in_sorted(pair_off, cap).astype(jnp.int32) - 1
    rr = jnp.clip(rr, 0, row_capacity - 1)
    if stage == "pairrank":
        return rr.sum()
    ptable, rr = jax.lax.optimization_barrier((ptable, rr))
    prows = ptable[rr]
    pvalid = p < total
    tile = jnp.where(pvalid, prows[:, 1] + (p - prows[:, 0]), n_tiles).astype(jnp.int32)
    gg = jnp.where(pvalid, prows[:, 2], n)
    tile, gg = jax.lax.optimization_barrier((tile, gg))
    if stage == "decode":
        return tile.sum() + gg.sum()
    w_eff = jnp.clip(cap - pair_off, 0, w)
    counts = B._row_tile_counts(ty, cx0, w_eff, nty, ntx)
    if stage == "counts":
        return counts.sum() + tile.sum()
    al = B.build_aligned_binning(
        proj, tile_h=TILE_H, tile_w=TILE_W, n_tiles_y=nty, n_tiles_x=ntx,
        pair_capacity=cap, chunk=128, num_gaussians=n)
    return al.pair_gaussian.sum() + al.tile_start.sum() + al.pair_slot.sum()


def old_full():
    proj = get_proj()
    al = OLD.build_aligned_binning(
        proj, tile_h=TILE_H, tile_w=TILE_W, n_tiles_y=nty, n_tiles_x=ntx,
        pair_capacity=cap, chunk=128, num_gaussians=n)
    return al.pair_gaussian.sum() + al.tile_start.sum() + al.pair_slot.sum()


print(f"old full       {run(old_full):7.2f} ms")
for st in ["sort+rects", "rowrank", "rowgather", "spans", "pairrank",
           "decode", "counts", "full"]:
    print(f"new {st:12s}{run(lambda st=st: new_prefix(st)):7.2f} ms")
