"""Round-4 instrumentation: pair counts + phase timings at bench scale.

Measures (on the real chip):
  * rect-pair total vs ellipse-pair total vs contributing pairs;
  * isolated phase costs by returning successive intermediates
    (PERF_NOTES "bisect the real function" pattern).
"""
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
n_tiles = nty * ntx
cap = default_pair_capacity(n, n_tiles)
print("pair_capacity", cap, "row_capacity", B.default_row_capacity(cap))


def get_proj():
    return preprocess(
        xyz, jnp.exp(scales_log),
        q / jnp.linalg.norm(q, axis=-1, keepdims=True),
        jax.nn.sigmoid(opacity_raw), cam, shs=shs, sh_degree=3,
        radius_mode="tight",
    )


@jax.jit
def stats():
    proj = get_proj()
    rx, ry = proj.radius_x, proj.radius_y
    xmin, xmax, ymin, ymax = B.tile_rect(
        proj.mean2d, rx, TILE_H, TILE_W, nty, ntx, 0, radius_y=ry)
    sx = jnp.maximum(xmax - xmin, 0)
    sy = jnp.where(proj.valid, jnp.maximum(ymax - ymin, 0), 0)
    rect_pairs = jnp.sum(jnp.where(proj.valid, sx * sy, 0))
    rows = jnp.sum(sy)
    al = B.build_aligned_binning(
        proj, tile_h=TILE_H, tile_w=TILE_W, n_tiles_y=nty, n_tiles_x=ntx,
        pair_capacity=cap, chunk=128, num_gaussians=n)
    ell_pairs = jnp.sum(al.tile_count)
    chunks = jnp.sum(-(-al.tile_count // 128))
    return rect_pairs, rows, ell_pairs, al.overflow, chunks


rp, rw, ep, ov, ch = jax.device_get(stats())
print(f"rect_pairs {rp}  rows {rw}  ellipse_pairs {ep}  overflow {ov}  chunks {ch}")

# ---- phase bisect: time successive prefixes of the binning -------------


def timeit(f, *args, iters=20):
    r = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


@jax.jit
def ph_proj():
    p = get_proj()
    return p.mean2d.sum() + p.conic.sum() + p.opacity.sum()


@jax.jit
def ph_binning():
    proj = get_proj()
    al = B.build_aligned_binning(
        proj, tile_h=TILE_H, tile_w=TILE_W, n_tiles_y=nty, n_tiles_x=ntx,
        pair_capacity=cap, chunk=128, num_gaussians=n)
    return al.pair_gaussian.sum() + al.tile_start.sum() + al.pair_slot.sum()


print(f"proj           {timeit(ph_proj):7.2f} ms")
print(f"proj+binning   {timeit(ph_binning):7.2f} ms")

# ---- direct measurement: which binned pairs actually contribute? -------
# (verifies the r3 "only ~25% contribute" claim against the exact
# per-tile ellipse culling's 11% yield)
from gaussian_mesh_splatting_tpu.ops.binning import tile_rect as _tile_rect

@jax.jit
def contrib_stats():
    proj = get_proj()
    al = B.build_aligned_binning(
        proj, tile_h=TILE_H, tile_w=TILE_W, n_tiles_y=nty, n_tiles_x=ntx,
        pair_capacity=cap, chunk=128, num_gaussians=n)
    # per sorted pair: tile id from the aligned layout
    P_al = al.pair_gaussian.shape[0]
    t_of_pair = jnp.searchsorted(
        al.tile_start, jnp.arange(P_al, dtype=jnp.int32), side="right"
    ).astype(jnp.int32) - 1
    live = al.pair_gaussian < n
    # gather pair attrs (depth-rank -> attrs)
    dorder = al.gaussian_order
    mx = jnp.take(proj.mean2d[:, 0], dorder)
    my = jnp.take(proj.mean2d[:, 1], dorder)
    A = jnp.take(proj.conic[:, 0], dorder)
    Bc = jnp.take(proj.conic[:, 1], dorder)
    C = jnp.take(proj.conic[:, 2], dorder)
    op = jnp.take(proj.opacity, dorder)
    gi = jnp.clip(al.pair_gaussian, 0, n - 1)
    pmx, pmy = mx[gi], my[gi]
    pA, pB, pC, pop = A[gi], Bc[gi], C[gi], op[gi]
    ty = t_of_pair // ntx
    tx = t_of_pair % ntx

    # discrete 32x32 pixel eval per pair, batched over pair chunks
    ix = jnp.arange(32, dtype=jnp.float32)
    def body(i, acc):
        s = i * 4096
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, s, 4096)
        dx = (sl(tx)[:, None] * 32 + ix[None, :]) - sl(pmx)[:, None]  # (k,32)
        dy = (sl(ty)[:, None] * 32 + ix[None, :]) - sl(pmy)[:, None]
        # Q over the 32x32 grid: (k, 32y, 32x)
        q = (sl(pA)[:, None, None] * dx[:, None, :] ** 2
             + 2 * sl(pB)[:, None, None] * dx[:, None, :] * dy[:, :, None]
             + sl(pC)[:, None, None] * dy[:, :, None] ** 2)
        alpha = sl(pop)[:, None, None] * jnp.exp(-0.5 * q)
        hit = (alpha >= 1.0 / 255.0).any(axis=(1, 2)) & sl(live)
        return acc + jnp.sum(hit)
    n_chunks = P_al // 4096
    contributing = jax.lax.fori_loop(0, n_chunks, body, jnp.zeros((), jnp.int32))
    return contributing, jnp.sum(live)

c, tot = jax.device_get(contrib_stats())
print(f"discretely-contributing pairs {c} / binned {tot} ({100.0*int(c)/int(tot):.1f}%)")
