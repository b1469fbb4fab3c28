"""Minimal full-step bench: FULL fwd and FULL fwd+bwd only (for A/B runs)."""
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


import os

CHUNK = int(os.environ.get("GMS_BENCH_CHUNK", "128"))


@jax.jit
def fwd_bwd(p):
    def loss_fn(pp, offset):
        out = render(make_bag(pp), cam, bg, sh_degree=3, backend="pallas",
                     mean2d_offset=offset, chunk=CHUNK)
        total, _ = photometric_loss(out.image, target, 0.2)
        return total
    offset = jnp.zeros((n, 2), jnp.float32)
    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(p, offset)
    return loss, grads


bench(fwd_bwd, params, name=f"FULL fwd+bwd (chunk={CHUNK})")
