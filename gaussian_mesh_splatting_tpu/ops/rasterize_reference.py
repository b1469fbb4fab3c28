"""Oracle rasterizer: a slow, exact, pure-JAX differentiable Gaussian
splatting renderer.

This is the behavioral specification for the fast Pallas path
(`rasterize_pallas.py`) and the CPU-runnable fallback. It reproduces the
reference CUDA rasterizer's compositing semantics exactly (contract pinned
at renderer/gaussian_renderer/__init__.py:94-102 and SURVEY.md §2.2):

  * Gaussians processed in increasing view depth (stable sort);
  * a Gaussian touches a pixel iff the pixel's tile intersects the
    Gaussian's radius rectangle (tile-granularity binning, parameterized
    tile size — 16x16 replicates CUDA; the Pallas path uses TPU-shaped
    tiles and is compared against this oracle at the same tile shape);
  * alpha = min(0.99, opacity * exp(power)), skipped when power > 0 or
    alpha < 1/255;
  * front-to-back compositing C += T * alpha * c, T *= (1 - alpha), with
    termination when T would drop below 1e-4 (the triggering Gaussian is
    NOT composited);
  * final color = C + T_final * background;
  * depth output = expected view-space depth sum_i w_i z_i (w_i = T_i
    alpha_i), plus the final transmittance as alpha information.

Gradients come from JAX autodiff through the compositing scan — including
the screen-space mean gradient, surfaced by differentiating w.r.t. the
`mean2d_offset` zeros input (see ops/projection.py docstring).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from .projection import ProjectedGaussians, preprocess

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


class RenderOutput(NamedTuple):
    image: jax.Array  # (H, W, 3)
    radii: jax.Array  # (N,) int32 conservative pixel radii (0 = invisible)
    depth: jax.Array  # (H, W) expected depth
    alpha: jax.Array  # (H, W) 1 - final transmittance
    mean2d: jax.Array  # (N, 2) projected pixel positions (for densify stats)
    overflow: jax.Array | None = None  # scalar: pairs dropped (pallas only)


def _composite_scan(
    proj: ProjectedGaussians,
    order: jax.Array,
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
    bg: jax.Array,
    scan_chunk: int | None = None,
):
    """Sequential front-to-back composite over depth-sorted Gaussians."""
    dtype = proj.mean2d.dtype
    px = jnp.arange(width, dtype=dtype)[None, :]
    py = jnp.arange(height, dtype=dtype)[:, None]
    tile_x = (jnp.arange(width, dtype=jnp.int32) // tile_w)[None, :]
    tile_y = (jnp.arange(height, dtype=jnp.int32) // tile_h)[:, None]
    n_tiles_x = -(-width // tile_w)
    n_tiles_y = -(-height // tile_h)

    g = jax.tree.map(lambda x: x[order], proj)

    def step(carry, gi):
        T, C, D, done = carry
        mx, my = gi.mean2d[0], gi.mean2d[1]
        a, b, c = gi.conic[0], gi.conic[1], gi.conic[2]
        # tile rectangle the Gaussian was binned into (CUDA getRect) —
        # shared with the Pallas binning for exact parity
        from .binning import tile_rect

        rect_xmin, rect_xmax, rect_ymin, rect_ymax = tile_rect(
            gi.mean2d,
            gi.radius if gi.radius_x is None else gi.radius_x,
            tile_h, tile_w, n_tiles_y, n_tiles_x,
            radius_y=gi.radius if gi.radius_y is None else gi.radius_y,
        )
        in_rect = (
            (tile_x >= rect_xmin) & (tile_x < rect_xmax)
            & (tile_y >= rect_ymin) & (tile_y < rect_ymax)
        )

        dx = mx - px
        dy = my - py
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, gi.opacity * jnp.exp(power))
        contributes = in_rect & (power <= 0.0) & (alpha >= ALPHA_MIN) & gi.valid
        alpha = jnp.where(contributes, alpha, 0.0)

        test_T = T * (1.0 - alpha)
        # the Gaussian that would push T below T_EPS terminates the pixel
        # without being composited (CUDA renderCUDA semantics)
        terminator = contributes & (test_T < T_EPS)
        include = contributes & ~done & ~terminator
        w = jnp.where(include, T * alpha, 0.0)
        C = C + w[..., None] * gi.color
        D = D + w * gi.depth
        T = jnp.where(include, test_T, T)
        done = done | (terminator & ~done)
        return (T, C, D, done), None

    T0 = jnp.ones((height, width), dtype)
    C0 = jnp.zeros((height, width, 3), dtype)
    D0 = jnp.zeros((height, width), dtype)
    done0 = jnp.zeros((height, width), bool)
    init = (T0, C0, D0, done0)
    n = order.shape[0]
    if scan_chunk is not None and n % scan_chunk == 0 and n > scan_chunk:
        # Chunked + rematerialized fold, identical semantics: a flat scan
        # saves its (H, W) carries for every one of N steps, which is
        # petabytes at oracle-vs-pallas bench scale; checkpointing each
        # `scan_chunk`-sized group keeps only the per-group carries and
        # recomputes inside the group on the backward pass.
        gc = jax.tree.map(
            lambda x: x.reshape(n // scan_chunk, scan_chunk, *x.shape[1:]), g
        )

        @jax.checkpoint
        def chunk_step(carry, gchunk):
            carry, _ = jax.lax.scan(step, carry, gchunk)
            return carry, None

        (T, C, D, _), _ = jax.lax.scan(chunk_step, init, gc)
    else:
        (T, C, D, _), _ = jax.lax.scan(step, init, g)
    image = C + T[..., None] * bg
    return image, D, 1.0 - T


def rasterize_reference(
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
    radius_mode: str = "tight",
    tile_size: tuple[int, int] = (16, 16),
    scan_chunk: int | None = None,
) -> RenderOutput:
    """Render one camera view. See module docstring for semantics.

    Args mirror the reference rasterizer call
    (renderer/gaussian_renderer/__init__.py:94-102): exactly one of
    `shs` / `colors`, and optionally `cov3d_precomp` instead of
    scales+rotations.
    """
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
        radius_mode=radius_mode,
    )
    depth_key = jnp.where(proj.valid, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key, stable=True)
    image, depth, alpha = _composite_scan(
        proj, order, cam.height, cam.width, tile_size[0], tile_size[1], bg,
        scan_chunk=scan_chunk,
    )
    return RenderOutput(
        image=image,
        radii=proj.radius.astype(jnp.int32),
        depth=depth,
        alpha=alpha,
        mean2d=proj.mean2d,
    )
