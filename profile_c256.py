"""chunk=256 kernels + 1-col scatter cost."""
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


def make_step(chunk):
    @jax.jit
    def step(p):
        def loss_fn(pp, offset):
            bagl = GaussianBag(
                xyz=pp["xyz"], scaling=jnp.exp(pp["scales_log"]),
                rotation=pp["q"] / jnp.linalg.norm(pp["q"], axis=-1, keepdims=True),
                opacity=jax.nn.sigmoid(pp["opacity_raw"]), shs=pp["shs"],
                alive=jnp.ones((n,), bool))
            out = render(bagl, cam, bg, sh_degree=3, backend="pallas",
                         mean2d_offset=offset, chunk=chunk)
            total, _ = photometric_loss(out.image, target, 0.2)
            return total
        offset = jnp.zeros((n, 2), jnp.float32)
        return jax.value_and_grad(loss_fn, argnums=(0, 1))(p, offset)
    return step


def bench(f, a, name, iters=10):
    o = f(a)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(a)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.2f} ms")


bench(make_step(256), params, "full step chunk=256")

P = (1 << 20) + 700 * 256
idx = jax.random.randint(jax.random.key(7), (P,), 0, n + 1).astype(jnp.int32)
vals = jax.random.normal(jax.random.key(8), (P,))


@jax.jit
def scat1(v):
    return jnp.zeros((n + 1,), jnp.float32).at[idx].add(v)


o = jax.block_until_ready(scat1(vals))
bench(scat1, vals, "1-col f32 scatter-add 1.2M->100k")


@jax.jit
def scat16(v):
    return jnp.zeros((n + 1, 16), jnp.float32).at[idx].add(
        jnp.broadcast_to(v[:, None], (P, 16)))


o = jax.block_until_ready(scat16(vals))
bench(scat16, vals, "16-col scatter-add (isolated)")
