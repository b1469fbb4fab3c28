"""Pallas TPU tile rasterizer — the fast path.

Replaces the reference's CUDA `diff-gaussian-rasterization` extension
(contract: renderer/gaussian_renderer/__init__.py:43-102, SURVEY.md §2.2)
with a TPU-native design:

  pipeline (all jit, one XLA program):
    preprocess (XLA, batched)          — project/cull/conic/SH, ops/projection.py
    build_tile_binning (XLA)           — capacity-bounded pair expansion +
                                         lexicographic sort, ops/binning.py
    align_binning (XLA)                — chunk-aligned per-tile ranges
    composite (Pallas, custom_vjp)     — per-tile front-to-back compositing
    background + crop (XLA)            — differentiable tail

Tile shape is (8, 128) pixels — exactly one float32 VPU vreg — so each
Gaussian step is a handful of full-width vector ops. Pair attributes are
streamed HBM -> VMEM in `chunk`-row DMAs; per-tile ranges are chunk-aligned
(ops/binning.py:align_binning) so backward chunk writes never straddle two
tiles. The backward kernel re-walks pairs back-to-front using the saved
final transmittance and last-contributor rank (the division trick of the
CUDA backward), emits per-pair gradients to HBM, and XLA's gather-VJP
segment-sums them onto Gaussians; projection/SH gradients then flow by
ordinary autodiff.

Compositing semantics (alpha clamp 0.99, 1/255 cutoff, T<1e-4 termination
excluding the terminator, tile-rect binning) match ops/rasterize_reference
exactly at equal tile shape — that oracle is the conformance test.
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.camera import Camera
from .binning import align_binning, build_tile_binning
from .projection import preprocess
from .rasterize_reference import ALPHA_MAX, ALPHA_MIN, RenderOutput, T_EPS

TILE_H = 8
TILE_W = 128
ATTR_COLS = 16  # [mx, my, ca, cb, cc, opacity, r, g, b, depth, pad...]


class _CompositeConfig(NamedTuple):
    hp: int
    wp: int
    n_tiles_y: int
    n_tiles_x: int
    chunk: int
    pair_capacity_aligned: int
    interpret: bool


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------

def _fwd_kernel(cfg: _CompositeConfig):
    chunk = cfg.chunk
    n_tiles_x = cfg.n_tiles_x

    def kernel(
        tile_start_ref,
        tile_count_ref,
        attrs_hbm,
        out_r,
        out_g,
        out_b,
        out_t,
        out_d,
        out_nc,
        buf,
        sem,
    ):
        t = pl.program_id(0)
        start = tile_start_ref[t]
        count = tile_count_ref[t]
        ty = t // n_tiles_x
        tx = t % n_tiles_x
        px = (tx * TILE_W + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)).astype(jnp.float32)
        py = (ty * TILE_H + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)).astype(jnp.float32)

        n_chunks = pl.cdiv(count, chunk)

        def pair_body(j, inner):
            T, r, g, b, d, nc, done, base = inner
            pos = base + j
            active = pos < count
            mx = buf[j, 0]
            my = buf[j, 1]
            ca = buf[j, 2]
            cb = buf[j, 3]
            cc = buf[j, 4]
            op = buf[j, 5]
            clr_r = buf[j, 6]
            clr_g = buf[j, 7]
            clr_b = buf[j, 8]
            z = buf[j, 9]
            dx = mx - px
            dy = my - py
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
            contrib = active & (power <= 0.0) & (alpha >= ALPHA_MIN)
            alpha = jnp.where(contrib, alpha, 0.0)
            test_t = T * (1.0 - alpha)
            terminator = contrib & (test_t < T_EPS)
            include = contrib & jnp.logical_not(done) & jnp.logical_not(terminator)
            w = jnp.where(include, T * alpha, 0.0)
            r = r + w * clr_r
            g = g + w * clr_g
            b = b + w * clr_b
            d = d + w * z
            T = jnp.where(include, test_t, T)
            nc = jnp.where(include, pos + 1, nc)
            done = jnp.logical_or(done, terminator)
            return (T, r, g, b, d, nc, done, base)

        def chunk_body(carry):
            ci, T, r, g, b, d, nc, done = carry
            cp = pltpu.make_async_copy(
                attrs_hbm.at[pl.ds(start + ci * chunk, chunk)], buf, sem
            )
            cp.start()
            cp.wait()
            T, r, g, b, d, nc, done, _ = jax.lax.fori_loop(
                0, chunk, pair_body, (T, r, g, b, d, nc, done, ci * chunk)
            )
            return (ci + 1, T, r, g, b, d, nc, done)

        def chunk_cond(carry):
            ci, T, r, g, b, d, nc, done = carry
            return (ci < n_chunks) & jnp.logical_not(jnp.all(done))

        shape = (TILE_H, TILE_W)
        init = (
            jnp.zeros((), jnp.int32),
            jnp.ones(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.int32),
            jnp.zeros(shape, bool),
        )
        _, T, r, g, b, d, nc, _ = jax.lax.while_loop(chunk_cond, chunk_body, init)
        out_r[:] = r
        out_g[:] = g
        out_b[:] = b
        out_t[:] = T
        out_d[:] = d
        out_nc[:] = nc

    return kernel


def _tile_index_map(n_tiles_x):
    def index_map(t, *_):
        return (t // n_tiles_x, t % n_tiles_x)

    return index_map


def _composite_fwd(cfg: _CompositeConfig, pair_attrs, tile_start, tile_count):
    n_tiles = cfg.n_tiles_y * cfg.n_tiles_x
    plane = jax.ShapeDtypeStruct((cfg.hp, cfg.wp), jnp.float32)
    plane_i = jax.ShapeDtypeStruct((cfg.hp, cfg.wp), jnp.int32)
    imap = _tile_index_map(cfg.n_tiles_x)
    block = pl.BlockSpec((TILE_H, TILE_W), imap)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[block, block, block, block, block, block],
        scratch_shapes=[
            pltpu.VMEM((cfg.chunk, ATTR_COLS), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _fwd_kernel(cfg),
        grid_spec=grid_spec,
        out_shape=[plane, plane, plane, plane, plane, plane_i],
        interpret=cfg.interpret,
    )(tile_start, tile_count, pair_attrs)


# --------------------------------------------------------------------------
# backward kernel
# --------------------------------------------------------------------------

def _bwd_kernel(cfg: _CompositeConfig):
    chunk = cfg.chunk
    n_tiles_x = cfg.n_tiles_x

    def kernel(
        tile_start_ref,
        tile_count_ref,
        attrs_hbm,
        t_final_ref,
        nc_ref,
        g_r_ref,
        g_g_ref,
        g_b_ref,
        g_t_ref,
        g_d_ref,
        pair_grads_hbm,
        buf,
        gbuf,
        sem_in,
        sem_out,
    ):
        t = pl.program_id(0)
        start = tile_start_ref[t]
        count = tile_count_ref[t]
        ty = t // n_tiles_x
        tx = t % n_tiles_x
        px = (tx * TILE_W + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)).astype(jnp.float32)
        py = (ty * TILE_H + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)).astype(jnp.float32)

        t_final = t_final_ref[:]
        nc = nc_ref[:]
        g_r = g_r_ref[:]
        g_g = g_g_ref[:]
        g_b = g_b_ref[:]
        g_t = g_t_ref[:]
        g_d = g_d_ref[:]

        n_chunks = pl.cdiv(count, chunk)

        def pair_body(jj, inner):
            # jj runs 0..chunk-1; reverse order within the chunk
            T, S, base = inner
            j = chunk - 1 - jj
            pos = base + j
            mx = buf[j, 0]
            my = buf[j, 1]
            ca = buf[j, 2]
            cb = buf[j, 3]
            cc = buf[j, 4]
            op = buf[j, 5]
            clr_r = buf[j, 6]
            clr_g = buf[j, 7]
            clr_b = buf[j, 8]
            z = buf[j, 9]
            dx = mx - px
            dy = my - py
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            G = jnp.exp(power)
            alpha_raw = op * G
            alpha = jnp.minimum(ALPHA_MAX, alpha_raw)
            contrib = (pos < count) & (power <= 0.0) & (alpha >= ALPHA_MIN)
            included = contrib & (pos < nc)
            alpha = jnp.where(included, alpha, 0.0)
            one_m = 1.0 - alpha
            # reconstruct transmittance in front of this pair
            T = jnp.where(included, T / one_m, T)
            w = jnp.where(included, T * alpha, 0.0)
            u = clr_r * g_r + clr_g * g_g + clr_b * g_b + z * g_d
            dalpha = jnp.where(included, T * u - S / one_m, 0.0)
            S = S + w * u
            unclamped = included & (alpha_raw < ALPHA_MAX)
            dpow = jnp.where(unclamped, dalpha * alpha_raw, 0.0)
            dop = jnp.where(unclamped, dalpha * G, 0.0)

            gbuf[j, 0] = jnp.sum(dpow * -(ca * dx + cb * dy))  # d mean_x
            gbuf[j, 1] = jnp.sum(dpow * -(cc * dy + cb * dx))  # d mean_y
            gbuf[j, 2] = jnp.sum(dpow * (-0.5 * dx * dx))  # d conic_a
            gbuf[j, 3] = jnp.sum(dpow * (-dx * dy))  # d conic_b
            gbuf[j, 4] = jnp.sum(dpow * (-0.5 * dy * dy))  # d conic_c
            gbuf[j, 5] = jnp.sum(dop)  # d opacity
            gbuf[j, 6] = jnp.sum(w * g_r)  # d color r
            gbuf[j, 7] = jnp.sum(w * g_g)
            gbuf[j, 8] = jnp.sum(w * g_b)
            gbuf[j, 9] = jnp.sum(w * g_d)  # d depth
            gbuf[j, 10] = 0.0
            gbuf[j, 11] = 0.0
            gbuf[j, 12] = 0.0
            gbuf[j, 13] = 0.0
            gbuf[j, 14] = 0.0
            gbuf[j, 15] = 0.0
            return (T, S, base)

        def chunk_body(carry):
            cj, T, S = carry  # cj counts processed chunks (reverse)
            ci = n_chunks - 1 - cj
            cp_in = pltpu.make_async_copy(
                attrs_hbm.at[pl.ds(start + ci * chunk, chunk)], buf, sem_in
            )
            cp_in.start()
            cp_in.wait()
            T, S, _ = jax.lax.fori_loop(0, chunk, pair_body, (T, S, ci * chunk))
            cp_out = pltpu.make_async_copy(
                gbuf, pair_grads_hbm.at[pl.ds(start + ci * chunk, chunk)], sem_out
            )
            cp_out.start()
            cp_out.wait()
            return (cj + 1, T, S)

        def chunk_cond(carry):
            cj, T, S = carry
            return cj < n_chunks

        init = (jnp.zeros((), jnp.int32), t_final, t_final * g_t)
        jax.lax.while_loop(chunk_cond, chunk_body, init)

    return kernel


def _composite_bwd(
    cfg: _CompositeConfig, pair_attrs, tile_start, tile_count, t_final, nc, g_r, g_g, g_b, g_t, g_d
):
    n_tiles = cfg.n_tiles_y * cfg.n_tiles_x
    imap = _tile_index_map(cfg.n_tiles_x)
    block = pl.BlockSpec((TILE_H, TILE_W), imap)
    block_i = pl.BlockSpec((TILE_H, TILE_W), imap)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # attrs
            block,  # t_final
            block_i,  # nc
            block,  # g_r
            block,  # g_g
            block,  # g_b
            block,  # g_t
            block,  # g_d
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((cfg.chunk, ATTR_COLS), jnp.float32),
            pltpu.VMEM((cfg.chunk, ATTR_COLS), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    (pair_grads,) = pl.pallas_call(
        _bwd_kernel(cfg),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((cfg.pair_capacity_aligned, ATTR_COLS), jnp.float32)
        ],
        interpret=cfg.interpret,
    )(tile_start, tile_count, pair_attrs, t_final, nc, g_r, g_g, g_b, g_t, g_d)
    return pair_grads


# --------------------------------------------------------------------------
# custom_vjp glue
# --------------------------------------------------------------------------

def _int_zero_cotangent(x):
    return np.zeros(x.shape, jax.dtypes.float0)


@functools.lru_cache(maxsize=32)
def _get_composite(cfg: _CompositeConfig):
    @jax.custom_vjp
    def composite(pair_attrs, tile_start, tile_count):
        return tuple(_composite_fwd(cfg, pair_attrs, tile_start, tile_count))

    def fwd(pair_attrs, tile_start, tile_count):
        out = _composite_fwd(cfg, pair_attrs, tile_start, tile_count)
        r, g, b, t_final, d, nc = out
        res = (pair_attrs, tile_start, tile_count, t_final, nc)
        return tuple(out), res

    def bwd(res, cots):
        pair_attrs, tile_start, tile_count, t_final, nc = res
        g_r, g_g, g_b, g_t, g_d, _g_nc = cots
        pair_grads = _composite_bwd(
            cfg, pair_attrs, tile_start, tile_count, t_final, nc, g_r, g_g, g_b, g_t, g_d
        )
        return (
            pair_grads,
            _int_zero_cotangent(tile_start),
            _int_zero_cotangent(tile_count),
        )

    composite.defvjp(fwd, bwd)
    return composite


# --------------------------------------------------------------------------
# public entry point
# --------------------------------------------------------------------------

def default_pair_capacity(num_gaussians: int, n_tiles: int) -> int:
    """Static pair-buffer size heuristic: ~8 tiles per Gaussian on average,
    rounded up to a power of two, at least 4096."""
    want = max(4096, num_gaussians * 8)
    return 1 << math.ceil(math.log2(want))


def rasterize_pallas(
    means3d: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    opacities: jax.Array,
    cam: Camera,
    *,
    bg: jax.Array,
    shs: jax.Array | None = None,
    colors: jax.Array | None = None,
    sh_degree: int = 0,
    scale_modifier: float = 1.0,
    cov3d_precomp: jax.Array | None = None,
    antialiasing: bool = False,
    mean2d_offset: jax.Array | None = None,
    alive: jax.Array | None = None,
    pair_capacity: int | None = None,
    chunk: int = 128,
    interpret: bool | None = None,
) -> RenderOutput:
    """Drop-in fast equivalent of `rasterize_reference` (same contract)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    proj = preprocess(
        means3d,
        scales,
        rotations,
        opacities,
        cam,
        shs=shs,
        colors=colors,
        sh_degree=sh_degree,
        scale_modifier=scale_modifier,
        cov3d_precomp=cov3d_precomp,
        antialiasing=antialiasing,
        mean2d_offset=mean2d_offset,
        alive=alive,
    )
    n = means3d.shape[0]
    h, w = cam.height, cam.width
    hp = -(-h // TILE_H) * TILE_H
    wp = -(-w // TILE_W) * TILE_W
    n_tiles_y = hp // TILE_H
    n_tiles_x = wp // TILE_W
    n_tiles = n_tiles_y * n_tiles_x
    if pair_capacity is None:
        pair_capacity = default_pair_capacity(n, n_tiles)
    aligned_capacity = pair_capacity + n_tiles * chunk

    # binning consumes no gradients (integer work)
    proj_ng = jax.lax.stop_gradient(proj)
    binning = build_tile_binning(
        proj_ng,
        tile_h=TILE_H,
        tile_w=TILE_W,
        n_tiles_y=n_tiles_y,
        n_tiles_x=n_tiles_x,
        pair_capacity=pair_capacity,
    )
    aligned = align_binning(
        binning, num_gaussians=n, chunk=chunk, aligned_capacity=aligned_capacity
    )

    # per-Gaussian attribute rows (+1 zero row for padding slots)
    rows = jnp.concatenate(
        [
            proj.mean2d,
            proj.conic,
            proj.opacity[:, None],
            proj.color,
            proj.depth[:, None],
            jnp.zeros((n, ATTR_COLS - 10), jnp.float32),
        ],
        axis=1,
    )
    attr = jnp.concatenate([rows, jnp.zeros((1, ATTR_COLS), rows.dtype)], axis=0)
    pair_attrs = attr[aligned.pair_gaussian]

    cfg = _CompositeConfig(
        hp=hp,
        wp=wp,
        n_tiles_y=n_tiles_y,
        n_tiles_x=n_tiles_x,
        chunk=chunk,
        pair_capacity_aligned=aligned_capacity,
        interpret=bool(interpret),
    )
    composite = _get_composite(cfg)
    r, g, b, t_final, d, _nc = composite(
        pair_attrs, aligned.tile_start, aligned.tile_count
    )

    image = jnp.stack([r, g, b], axis=-1)[:h, :w]
    t_crop = t_final[:h, :w]
    image = image + t_crop[..., None] * bg
    return RenderOutput(
        image=image,
        radii=proj.radius.astype(jnp.int32),
        depth=d[:h, :w],
        alpha=1.0 - t_crop,
        mean2d=proj.mean2d,
    )
