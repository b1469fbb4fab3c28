"""Time the composite fwd and bwd Pallas kernels in isolation."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_mesh_splatting_tpu.core import make_camera
from gaussian_mesh_splatting_tpu.models.gaussian_bag import GaussianBag
from gaussian_mesh_splatting_tpu.ops import rasterize_pallas as rp
from gaussian_mesh_splatting_tpu.ops.binning import build_aligned_binning
from gaussian_mesh_splatting_tpu.ops.projection import preprocess

n = 100_000
width = height = 800
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

bag = GaussianBag(
    xyz=xyz, scaling=jnp.exp(scales_log),
    rotation=q / jnp.linalg.norm(q, axis=-1, keepdims=True),
    opacity=jax.nn.sigmoid(opacity_raw), shs=shs, alive=jnp.ones((n,), bool))


@jax.jit
def build_inputs():
    proj = preprocess(bag.xyz, bag.scaling, bag.rotation, bag.opacity, cam,
                      shs=bag.shs, sh_degree=3, alive=bag.alive)
    hp, wp = 800, 896
    n_tiles_y, n_tiles_x = 100, 7
    pair_capacity = 1 << 20
    aligned = build_aligned_binning(
        jax.lax.stop_gradient(proj), tile_h=8, tile_w=128,
        n_tiles_y=n_tiles_y, n_tiles_x=n_tiles_x,
        pair_capacity=pair_capacity, chunk=chunk, num_gaussians=n)
    rows = jnp.concatenate(
        [proj.mean2d, proj.conic, proj.opacity[:, None], proj.color,
         proj.depth[:, None], jnp.zeros((n, rp.ATTR_COLS - 10), jnp.float32)],
        axis=1)
    order_ext = jnp.concatenate(
        [aligned.gaussian_order, jnp.full((1,), n, jnp.int32)])
    attr = jnp.concatenate([rows, jnp.zeros((1, rp.ATTR_COLS))], axis=0)
    attr_sorted = jnp.take(attr, order_ext, axis=0)
    pair_attrs = attr_sorted[aligned.pair_gaussian].T
    return pair_attrs, aligned.tile_start, aligned.tile_count


pair_attrs, tile_start, tile_count = jax.block_until_ready(build_inputs())
cfg = rp._CompositeConfig(hp=800, wp=896, n_tiles_y=100, n_tiles_x=7,
                          chunk=chunk,
                          pair_capacity_aligned=pair_attrs.shape[1],
                          interpret=False)
row_off = jnp.zeros((1,), jnp.int32)

fwd_fn = jax.jit(lambda pa: rp._composite_fwd(cfg, pa, tile_start, tile_count, row_off))
out = jax.block_until_ready(fwd_fn(pair_attrs))
r, g, b, t_final, d, nc = out

ones = jnp.ones((800, 896), jnp.float32)
bwd_fn = jax.jit(lambda pa: rp._composite_bwd(
    cfg, pa, tile_start, tile_count, row_off, t_final, nc,
    ones, ones, ones, ones * 0.1, ones * 0.1))
pg = jax.block_until_ready(bwd_fn(pair_attrs))


def bench(f, a, name, iters=10):
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(a)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.2f} ms")


bench(fwd_fn, pair_attrs, "composite fwd kernel")
bench(bwd_fn, pair_attrs, "composite bwd kernel")
print("max_nc overall:", int(jnp.max(nc)), "pairs:", int(jnp.sum(tile_count)))


# ---- backward-tail suspects ------------------------------------------------
@jax.jit
def build_idx():
    proj = preprocess(bag.xyz, bag.scaling, bag.rotation, bag.opacity, cam,
                      shs=bag.shs, sh_degree=3, alive=bag.alive)
    aligned = build_aligned_binning(
        jax.lax.stop_gradient(proj), tile_h=8, tile_w=128,
        n_tiles_y=100, n_tiles_x=7,
        pair_capacity=1 << 20, chunk=chunk, num_gaussians=n)
    return aligned.pair_gaussian, aligned.gaussian_order


idx, order = jax.block_until_ready(build_idx())
attr0 = jax.random.normal(jax.random.key(9), (n + 1, rp.ATTR_COLS))
ct = jax.random.normal(jax.random.key(10), (rp.ATTR_COLS, pair_attrs.shape[1]))


def gather_chain(a):
    order_ext = jnp.concatenate([order, jnp.full((1,), n, jnp.int32)])
    a_sorted = jnp.take(a, order_ext, axis=0)
    ab, ib = jax.lax.optimization_barrier((a_sorted, idx))
    return ab[ib].T


@jax.jit
def gather_vjp(a, c):
    _, vjp = jax.vjp(gather_chain, a)
    return vjp(c)[0]


o = jax.block_until_ready(gather_vjp(attr0, ct))
bench(lambda a: gather_vjp(a, ct), attr0, "pair-attr gather VJP (in context)")

# preprocess VJP
def prep_loss(params):
    bagl = GaussianBag(
        xyz=params["xyz"], scaling=jnp.exp(params["s"]),
        rotation=params["q"] / jnp.linalg.norm(params["q"], axis=-1, keepdims=True),
        opacity=jax.nn.sigmoid(params["o"]), shs=params["shs"],
        alive=jnp.ones((n,), bool))
    proj = preprocess(bagl.xyz, bagl.scaling, bagl.rotation, bagl.opacity, cam,
                      shs=bagl.shs, sh_degree=3, alive=bagl.alive)
    return (jnp.sum(proj.mean2d) + jnp.sum(proj.conic) + jnp.sum(proj.color)
            + jnp.sum(proj.opacity) + jnp.sum(proj.depth))


params0 = dict(xyz=xyz, s=scales_log, q=q, o=opacity_raw, shs=shs)
prep_grad = jax.jit(jax.grad(prep_loss))
o = jax.block_until_ready(prep_grad(params0))
bench(prep_grad, params0, "preprocess fwd+VJP")
