"""Phase-level timing of the bench workload: binning, fwd, fwd+bwd."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_mesh_splatting_tpu.core import make_camera
from gaussian_mesh_splatting_tpu.models.gaussian_bag import GaussianBag
from gaussian_mesh_splatting_tpu.renderer import render
from gaussian_mesh_splatting_tpu.train.loss import photometric_loss

n = 100_000
width = height = 800

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
        xyz=p["xyz"],
        scaling=jnp.exp(p["scales_log"]),
        rotation=p["q"] / jnp.linalg.norm(p["q"], axis=-1, keepdims=True),
        opacity=jax.nn.sigmoid(p["opacity_raw"]),
        shs=p["shs"],
        alive=jnp.ones((n,), bool),
    )


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


# binning-only: use the internal API
from gaussian_mesh_splatting_tpu.ops.binning import build_aligned_binning
from gaussian_mesh_splatting_tpu.ops.projection import preprocess


@jax.jit
def prep_only(p):
    bag = make_bag(p)
    return preprocess(
        bag.xyz, bag.scaling, bag.rotation, bag.opacity, cam,
        shs=bag.shs, sh_degree=3, alive=bag.alive)


from gaussian_mesh_splatting_tpu.ops.rasterize_pallas import (
    TILE_H, TILE_W, default_pair_capacity)


@jax.jit
def prep_and_bin(p):
    bag = make_bag(p)
    proj = preprocess(
        bag.xyz, bag.scaling, bag.rotation, bag.opacity, cam,
        shs=bag.shs, sh_degree=3, alive=bag.alive)
    n_tiles_y = -(-height // TILE_H)
    n_tiles_x = -(-width // TILE_W)
    n_tiles = n_tiles_y * n_tiles_x
    aligned = build_aligned_binning(
        jax.lax.stop_gradient(proj),
        tile_h=TILE_H, tile_w=TILE_W,
        n_tiles_y=n_tiles_y, n_tiles_x=n_tiles_x,
        pair_capacity=default_pair_capacity(n, n_tiles),
        chunk=128, num_gaussians=n)
    return aligned


def bench(f, name, iters=10):
    o = f(params)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(params)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.1f} ms")
    return dt


bench(prep_only, "prep only")
bench(prep_and_bin, "prep+bin")
bench(fwd_only, "fwd only")
bench(fwd_bwd, "fwd+bwd(real)")
