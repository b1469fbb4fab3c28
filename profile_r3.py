"""Round-3 bisect profiler: isolate every phase of the bench fwd+bwd step.

Phases measured (bench workload: 100k Gaussians, 800x800, SH3):
  prep fwd / prep fwd+vjp
  binning
  expand fwd (attr gather to (16,P))
  expand vjp (sort + cumsum segment-sum tail)
  composite fwd kernel
  composite bwd kernel
  ssim fwd+bwd
  full fwd / full fwd+bwd
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_mesh_splatting_tpu.core import make_camera
from gaussian_mesh_splatting_tpu.models.gaussian_bag import GaussianBag
from gaussian_mesh_splatting_tpu.renderer import render
from gaussian_mesh_splatting_tpu.train.loss import photometric_loss
from gaussian_mesh_splatting_tpu.ops.binning import build_aligned_binning
from gaussian_mesh_splatting_tpu.ops.projection import preprocess
from gaussian_mesh_splatting_tpu.ops import rasterize_pallas as rp

n = 100_000
width = height = 800
CHUNK = 128

k = jax.random.split(jax.random.key(0), 6)
xyz = jax.random.normal(k[0], (n, 3)) * 0.5
scales_log = jax.random.normal(k[1], (n, 3)) * 0.3 - 3.5
q = jax.random.normal(k[2], (n, 4))
opacity_raw = jax.random.normal(k[3], (n, 1))
shs = jnp.concatenate(
    [jax.random.uniform(k[4], (n, 3, 1)) * 2 - 0.5,
     jax.random.normal(k[5], (n, 3, 15)) * 0.01], axis=-1)
cam = make_camera(np.eye(3), np.array([0.0, 0.0, 4.0]), 0.8, 0.8, width, height)
target = jnp.zeros((height, width, 3))
bg = jnp.zeros(3)
params = dict(xyz=xyz, scales_log=scales_log, q=q, opacity_raw=opacity_raw, shs=shs)


def make_bag(p):
    return GaussianBag(
        xyz=p["xyz"], scaling=jnp.exp(p["scales_log"]),
        rotation=p["q"] / jnp.linalg.norm(p["q"], axis=-1, keepdims=True),
        opacity=jax.nn.sigmoid(p["opacity_raw"]),
        shs=p["shs"], alive=jnp.ones((n,), bool))


def bench(f, *args, name="", iters=20):
    o = f(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.2f} ms")
    return dt


# ---- staged pipeline pieces --------------------------------------------
hp = -(-height // rp.TILE_H) * rp.TILE_H
wp = -(-width // rp.TILE_W) * rp.TILE_W
n_tiles_y, n_tiles_x = hp // rp.TILE_H, wp // rp.TILE_W
n_tiles = n_tiles_y * n_tiles_x
cap = rp.default_pair_capacity(n, n_tiles)
cap_al = cap + n_tiles * CHUNK


@jax.jit
def stage_prep(p):
    bag = make_bag(p)
    return preprocess(bag.xyz, bag.scaling, bag.rotation, bag.opacity, cam,
                      shs=bag.shs, sh_degree=3, alive=bag.alive)


@jax.jit
def stage_prep_vjp(p):
    def f(pp):
        bag = make_bag(pp)
        pr = preprocess(bag.xyz, bag.scaling, bag.rotation, bag.opacity, cam,
                        shs=bag.shs, sh_degree=3, alive=bag.alive)
        return (pr.mean2d.sum() + pr.conic.sum() + pr.color.sum()
                + pr.opacity.sum() + pr.depth.sum())
    return jax.grad(f)(p)


proj0 = jax.block_until_ready(stage_prep(params))


@jax.jit
def stage_bin(proj):
    return build_aligned_binning(
        jax.lax.stop_gradient(proj), tile_h=rp.TILE_H, tile_w=rp.TILE_W,
        n_tiles_y=n_tiles_y, n_tiles_x=n_tiles_x, pair_capacity=cap,
        chunk=CHUNK, num_gaussians=n)


aligned0 = jax.block_until_ready(stage_bin(proj0))


def build_rows(proj):
    rows = jnp.concatenate([
        proj.mean2d, proj.conic, proj.opacity[:, None], proj.color,
        proj.depth[:, None], jnp.zeros((n, rp.ATTR_COLS - 10), jnp.float32)],
        axis=1)
    order_ext = jnp.concatenate([aligned0.gaussian_order,
                                 jnp.full((1,), n, jnp.int32)])
    attr = jnp.concatenate([rows, jnp.zeros((1, rp.ATTR_COLS), rows.dtype)], axis=0)
    return jnp.take(attr, order_ext, axis=0)


@jax.jit
def stage_expand(proj):
    return rp._get_expand_pairs(cap)(
        build_rows(proj), aligned0.pair_gaussian, aligned0.pair_slot,
        aligned0.seg_start, aligned0.seg_end)


pair_attrs0 = jax.block_until_ready(stage_expand(proj0))


@jax.jit
def stage_expand_vjp(proj):
    out, vjp = jax.vjp(stage_expand, proj)
    return vjp(jnp.ones_like(out))


cfg = rp._CompositeConfig(
    hp=n_tiles_y * rp._VREG_H, wp=n_tiles_x * rp._VREG_W,
    n_tiles_y=n_tiles_y, n_tiles_x=n_tiles_x, chunk=CHUNK,
    pair_capacity_aligned=cap_al, interpret=False)
row_off = jnp.zeros((1,), jnp.int32)


@jax.jit
def stage_fwd_kernel(pair_attrs):
    return rp._composite_fwd(cfg, pair_attrs, aligned0.tile_start,
                             aligned0.tile_count, row_off)


fwd_out = jax.block_until_ready(stage_fwd_kernel(pair_attrs0))
r0, g0, b0, t_final0, d0, nc0 = fwd_out
ones = jnp.ones_like(r0)


@jax.jit
def stage_bwd_kernel(pair_attrs):
    return rp._composite_bwd(cfg, pair_attrs, aligned0.tile_start,
                             aligned0.tile_count, row_off, t_final0, nc0,
                             ones, ones, ones, ones, ones)


@jax.jit
def stage_ssim(img):
    def f(im):
        total, _ = photometric_loss(im, target, 0.2)
        return total
    return jax.grad(f)(img)


@jax.jit
def fwd_only(p):
    out = render(make_bag(p), cam, bg, sh_degree=3, backend="pallas")
    return out.image.sum()


@jax.jit
def fwd_bwd(p):
    def loss_fn(pp, offset):
        out = render(make_bag(pp), cam, bg, sh_degree=3, backend="pallas",
                     mean2d_offset=offset)
        total, _ = photometric_loss(out.image, target, 0.2)
        return total
    offset = jnp.zeros((n, 2), jnp.float32)
    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(p, offset)
    return loss, grads


img0 = jnp.zeros((height, width, 3))

bench(stage_prep, params, name="prep fwd")
bench(stage_prep_vjp, params, name="prep fwd+vjp")
bench(stage_bin, proj0, name="binning")
bench(stage_expand, proj0, name="expand fwd (gather)")
bench(stage_expand_vjp, proj0, name="expand fwd+vjp (tail)")
bench(stage_fwd_kernel, pair_attrs0, name="composite fwd kernel")
bench(stage_bwd_kernel, pair_attrs0, name="composite bwd kernel")
bench(stage_ssim, img0, name="ssim fwd+bwd")
bench(fwd_only, params, name="FULL fwd")
bench(fwd_bwd, params, name="FULL fwd+bwd")
