"""Micro-bench: binning sort variants at bench scale, measured with an
on-device chained fori_loop (each iteration consumes the previous result)
so dispatch/RPC latency and any result caching cannot distort timings."""
import time

import jax
import jax.numpy as jnp
import numpy as np

P = 1_179_648
N_TILES = 626
ITERS = 20

k = jax.random.key(0)
tile0 = jax.random.randint(k, (P,), 0, N_TILES, jnp.int32)
g0 = jax.random.randint(jax.random.key(1), (P,), 0, 100_000, jnp.int32)
iota = jnp.arange(P, dtype=jnp.int32)
d0 = jax.random.uniform(jax.random.key(2), (100_000,))


def bench_loop(body, init, name):
    """body: (carry) -> carry, chained ITERS times inside one jit."""

    @jax.jit
    def run(init):
        return jax.lax.fori_loop(0, ITERS, lambda i, c: body(i, c), init)

    o = run(init)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = run(init)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt*1e3:.2f} ms")


def dep(x, prev):
    # cheap data dependence on the previous iteration's output
    return x ^ (prev[0] & 1)


bench_loop(
    lambda i, c: jax.lax.sort((dep(tile0, c[0]), g0, iota), num_keys=1, is_stable=True),
    (tile0, g0, iota),
    "stable 1key+2payload (current)",
)
bench_loop(
    lambda i, c: jax.lax.sort((dep(tile0, c[0]), g0), num_keys=1, is_stable=True),
    (tile0, g0),
    "stable 1key+1payload",
)


def packed_body(i, c):
    t = dep(tile0, c[0])
    packed = (t << 21) | iota
    key, gs = jax.lax.sort((packed, g0), num_keys=1, is_stable=False)
    return (key & 0x1FFFFF, gs)


bench_loop(packed_body, (tile0, g0), "packed unstable 1key+1payload")


def packed_nopayload_body(i, c):
    t = dep(tile0, c[0])
    packed = (t << 21) | iota
    (key,) = jax.lax.sort((packed,), num_keys=1, is_stable=False)
    return (key & 0x1FFFFF,)


bench_loop(packed_nopayload_body, (tile0,), "packed unstable key-only")

bench_loop(
    lambda i, c: (jnp.argsort(d0 + (c[0][0] & 1).astype(jnp.float32), stable=True),),
    (jnp.zeros((100_000,), jnp.int32),),
    "depth argsort 100k (stable)",
)

rows0 = jax.random.normal(jax.random.key(3), (P, 10))
src0 = jax.random.randint(jax.random.key(4), (2**20,), 0, P, jnp.int32)


def gather_body(i, c):
    r, s = jax.lax.optimization_barrier((rows0 + c[0][0, 0], src0))
    return (r[s],)


bench_loop(gather_body, (rows0[: 2**20],), "wide (P,10) row gather @1M")
