"""Round-2 bisection profile: cumulative stage timings of the bench workload.

Each stage returns successive intermediates of the REAL pipeline (so fusion
context is realistic, PERF_NOTES fact #8). Run on the TPU chip.
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

k = jax.random.split(jax.random.key(0), 6)
params = dict(
    xyz=jax.random.normal(k[0], (n, 3)) * 0.5,
    scales_log=jax.random.normal(k[1], (n, 3)) * 0.3 - 3.5,
    q=jax.random.normal(k[2], (n, 4)),
    opacity_raw=jax.random.normal(k[3], (n, 1)),
    shs=jnp.concatenate(
        [jax.random.uniform(k[4], (n, 3, 1)) * 2 - 0.5,
         jax.random.normal(k[5], (n, 3, 15)) * 0.01], axis=-1),
)
cam = make_camera(np.eye(3), np.array([0.0, 0.0, 4.0]), 0.8, 0.8, width, height)
target = jnp.zeros((height, width, 3))
bg = jnp.zeros(3)

CAP = None  # default capacity


def make_bag(p):
    return GaussianBag(
        xyz=p["xyz"],
        scaling=jnp.exp(p["scales_log"]),
        rotation=p["q"] / jnp.linalg.norm(p["q"], axis=-1, keepdims=True),
        opacity=jax.nn.sigmoid(p["opacity_raw"]),
        shs=p["shs"],
        alive=jnp.ones((n,), bool),
    )


def stage_pipeline(p, upto, capacity=None, with_grad=False):
    bag = make_bag(p)
    proj = preprocess(bag.xyz, bag.scaling, bag.rotation, bag.opacity, cam,
                      shs=bag.shs, sh_degree=3, alive=bag.alive)
    if upto == "prep":
        return proj
    n_tiles_y = -(-height // rp.TILE_H)
    n_tiles_x = -(-width // rp.TILE_W)
    n_tiles = n_tiles_y * n_tiles_x
    pair_capacity = capacity or rp.default_pair_capacity(n, n_tiles)
    aligned = build_aligned_binning(
        jax.lax.stop_gradient(proj), tile_h=rp.TILE_H, tile_w=rp.TILE_W,
        n_tiles_y=n_tiles_y, n_tiles_x=n_tiles_x,
        pair_capacity=pair_capacity, chunk=128, num_gaussians=n)
    if upto == "bin":
        return aligned
    rows = jnp.concatenate(
        [proj.mean2d, proj.conic, proj.opacity[:, None], proj.color,
         proj.depth[:, None], jnp.zeros((n, rp.ATTR_COLS - 10), jnp.float32)],
        axis=1)
    order_ext = jnp.concatenate(
        [aligned.gaussian_order, jnp.full((1,), n, jnp.int32)])
    attr = jnp.concatenate([rows, jnp.zeros((1, rp.ATTR_COLS), rows.dtype)], axis=0)
    attr_sorted = jnp.take(attr, order_ext, axis=0)
    pair_attrs = rp._get_expand_pairs(pair_capacity)(
        attr_sorted, aligned.pair_gaussian, aligned.pair_slot,
        aligned.seg_start, aligned.seg_end)
    if upto == "expand":
        return pair_attrs
    raise ValueError(upto)


@jax.jit
def prep_only(p):
    return stage_pipeline(p, "prep")


@jax.jit
def prep_bin(p):
    return stage_pipeline(p, "bin")


@jax.jit
def prep_bin_expand(p):
    return stage_pipeline(p, "expand")


@jax.jit
def fwd_render(p):
    out = render(make_bag(p), cam, bg, sh_degree=3, backend="pallas")
    return out.image.sum(), out.overflow


def loss_fn(pp, offset, capacity=None):
    out = render(make_bag(pp), cam, bg, sh_degree=3, backend="pallas",
                 mean2d_offset=offset, pair_capacity=capacity)
    total, _ = photometric_loss(out.image, target, 0.2)
    return total


@jax.jit
def fwd_bwd(p):
    offset = jnp.zeros((n, 2), jnp.float32)
    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(p, offset)
    return loss, grads


@jax.jit
def fwd_bwd_cap21(p):
    offset = jnp.zeros((n, 2), jnp.float32)
    loss, grads = jax.value_and_grad(
        lambda pp, o: loss_fn(pp, o, capacity=1 << 21), argnums=(0, 1))(p, offset)
    return loss, grads


# backward through composite only: stop_gradient the preprocess outputs so
# the VJP covers kernel-bwd + pair-grad tail but not projection/SH grads
@jax.jit
def fwd_bwd_composite_only(p):
    bag = make_bag(p)

    def f(rows_in):
        proj = preprocess(bag.xyz, bag.scaling, bag.rotation, bag.opacity,
                          cam, shs=bag.shs, sh_degree=3, alive=bag.alive)
        n_tiles_y = -(-height // rp.TILE_H)
        n_tiles_x = -(-width // rp.TILE_W)
        n_tiles = n_tiles_y * n_tiles_x
        pair_capacity = rp.default_pair_capacity(n, n_tiles)
        aligned = build_aligned_binning(
            jax.lax.stop_gradient(proj), tile_h=rp.TILE_H, tile_w=rp.TILE_W,
            n_tiles_y=n_tiles_y, n_tiles_x=n_tiles_x,
            pair_capacity=pair_capacity, chunk=128, num_gaussians=n)
        order_ext = jnp.concatenate(
            [aligned.gaussian_order, jnp.full((1,), n, jnp.int32)])
        attr = jnp.concatenate(
            [rows_in, jnp.zeros((1, rp.ATTR_COLS), rows_in.dtype)], axis=0)
        attr_sorted = jnp.take(attr, order_ext, axis=0)
        pair_attrs = rp._get_expand_pairs(pair_capacity)(
            attr_sorted, aligned.pair_gaussian, aligned.pair_slot,
            aligned.seg_start, aligned.seg_end)
        cfg = rp._CompositeConfig(
            hp=800, wp=896, n_tiles_y=n_tiles_y, n_tiles_x=n_tiles_x,
            chunk=128, pair_capacity_aligned=pair_capacity + n_tiles * 128,
            interpret=False)
        row_off = jnp.zeros((1,), jnp.int32)
        r, g, b, t_final, d, _nc = rp._get_composite(cfg)(
            pair_attrs, aligned.tile_start, aligned.tile_count, row_off)
        return r.sum() + g.sum() + b.sum() + t_final.sum()

    proj0 = jax.lax.stop_gradient(
        preprocess(bag.xyz, bag.scaling, bag.rotation, bag.opacity, cam,
                   shs=bag.shs, sh_degree=3, alive=bag.alive))
    rows0 = jnp.concatenate(
        [proj0.mean2d, proj0.conic, proj0.opacity[:, None], proj0.color,
         proj0.depth[:, None], jnp.zeros((n, rp.ATTR_COLS - 10), jnp.float32)],
        axis=1)
    return jax.value_and_grad(f)(rows0)


# grad of just the preprocess+loss-like scalar (no raster): preprocess VJP cost
@jax.jit
def prep_grad(p):
    def f(pp):
        proj = preprocess(
            make_bag(pp).xyz, make_bag(pp).scaling, make_bag(pp).rotation,
            make_bag(pp).opacity, cam, shs=make_bag(pp).shs, sh_degree=3,
            alive=make_bag(pp).alive)
        return (proj.mean2d.sum() + proj.conic.sum() + proj.color.sum()
                + proj.opacity.sum() + proj.depth.sum())
    return jax.grad(f)(p)


# L1+SSIM loss alone fwd+bwd
@jax.jit
def loss_only(img):
    def f(im):
        total, _ = photometric_loss(im, target, 0.2)
        return total
    return jax.grad(f)(img)


def bench(f, name, arg=None, iters=10):
    a = params if arg is None else arg
    o = f(a)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(a)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s}: {dt*1e3:7.2f} ms")
    return dt


if __name__ == "__main__":
    img = jnp.zeros((height, width, 3))
    # report overflow state
    _, ov = fwd_render(params)
    print("overflow(default cap):", int(ov))
    bench(prep_only, "prep fwd")
    bench(prep_grad, "prep fwd+vjp")
    bench(prep_bin, "prep+bin")
    bench(prep_bin_expand, "prep+bin+expand")
    bench(fwd_render, "full fwd")
    bench(loss_only, "ssim/l1 fwd+bwd", arg=img)
    bench(fwd_bwd_composite_only, "composite fwd+bwd only")
    bench(fwd_bwd, "full fwd+bwd")
    bench(fwd_bwd_cap21, "full fwd+bwd cap=2^21")
