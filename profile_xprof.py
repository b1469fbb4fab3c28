"""Capture an XProf trace of the bench fwd+bwd step."""
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
        opacity=jax.nn.sigmoid(p["opacity_raw"]), shs=p["shs"],
        alive=jnp.ones((n,), bool),
    )


@jax.jit
def fwd_bwd(p):
    def loss_fn(pp, offset):
        out = render(make_bag(pp), cam, bg, sh_degree=3, backend="pallas",
                     mean2d_offset=offset)
        total, _ = photometric_loss(out.image, target, 0.2)
        return total
    offset = jnp.zeros((n, 2), jnp.float32)
    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(p, offset)
    return loss


r = jax.block_until_ready(fwd_bwd(params))
jax.profiler.start_trace("/tmp/xprof_r4")
for _ in range(5):
    r = fwd_bwd(params)
jax.block_until_ready(r)
jax.profiler.stop_trace()
print("trace done", float(r))
