"""Micro-profiles of the suspected hot sub-ops at bench sizes."""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 100_000
P = 1 << 20
PAD = 700 * 128
PA = P + PAD

k = jax.random.split(jax.random.key(0), 8)
tile_all = jax.random.randint(k[0], (PA,), 0, 701).astype(jnp.int32)
g_all = jax.random.randint(k[1], (PA,), 0, N + 1).astype(jnp.int32)
depth = jax.random.uniform(k[2], (N,)) * 10
offsets = jnp.sort(jax.random.randint(k[3], (N,), 0, P)).astype(jnp.int32)
table = jax.random.randint(k[4], (N, 8), 0, 1000).astype(jnp.int32)
gidx = jax.random.randint(k[5], (P,), 0, N).astype(jnp.int32)
attr = jax.random.normal(k[6], (N + 1, 16))
pair_g = jax.random.randint(k[7], (PA,), 0, N + 1).astype(jnp.int32)
pair_grads = jax.random.normal(k[0], (16, PA))


def bench(f, args, name, iters=20):
    ff = jax.jit(f)
    o = ff(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = ff(*args)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.2f} ms")


bench(lambda t, g: jax.lax.sort((t, g), num_keys=1, is_stable=True),
      (tile_all, g_all), "pair sort 1.13M (1key+payload)")
bench(lambda d: jnp.argsort(d, stable=True), (depth,), "argsort 100k")
bench(lambda o: jnp.cumsum(jnp.zeros((P,), jnp.int32).at[jnp.clip(o, 0, P - 1)].add(1)),
      (offsets,), "rank_in_sorted (scatter 100k + cumsum 1M)")
bench(lambda t, g: jax.lax.optimization_barrier((t, g))[0][jax.lax.optimization_barrier((t, g))[1]],
      (table, gidx), "table gather 1M x8")
bench(lambda t: jnp.zeros((702,), jnp.int32).at[t].add(1), (tile_all,), "histogram 1.13M -> 702")
bench(lambda a, i: a[i].T, (attr, pair_g), "attr gather 1.13M x16 + T")


def scatter_vjp(a, i, ct):
    _, vjp = jax.vjp(lambda aa: aa[i].T, a)
    return vjp(ct)[0]


bench(scatter_vjp, (attr, pair_g, pair_grads), "attr-gather VJP (scatter-add 1.13M x16)")

# SSIM fwd+bwd at 800x800
from gaussian_mesh_splatting_tpu.train.loss import photometric_loss

img = jax.random.uniform(k[1], (800, 800, 3))
tgt = jax.random.uniform(k[2], (800, 800, 3))
bench(lambda a, b: jax.grad(lambda x: photometric_loss(x, b, 0.2)[0])(a),
      (img, tgt), "photometric loss fwd+bwd 800x800")
