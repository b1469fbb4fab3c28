"""Tile binning: Gaussian -> (tile, pair) expansion with static shapes.

The CUDA rasterizer builds a duplicated (tile | depth)-keyed pair list with
a dynamic total; XLA needs static shapes, so we use a capacity-bounded pair
buffer (`pair_capacity`) and a *gather* formulation instead of scatter:

  1. per-Gaussian tile rect (shared with the oracle so binning semantics
     are identical) and span size s_g — Gaussians are PRE-SORTED by view
     depth (stable argsort, ties = index order, exactly the oracle's
     ordering) so pairs are expanded in depth-rank order;
  2. exclusive cumsum -> pair offsets o_g;
  3. pair slot p finds its Gaussian via searchsorted(o, p) and decodes its
     tile from the local index p - o_g — pure gathers, MXU/VPU friendly;
  4. ONE stable `lax.sort` on the int32 tile key — the within-tile depth
     order rides along on stability thanks to the depth pre-sort (the CUDA
     rasterizer's 64-bit (tile|depth) radix sort collapses to this);
  5. per-tile counts computed analytically from the rects (corner-delta
     2D prefix sum, `_analytic_tile_counts`) — no per-pair histogram.

Overflow (total pairs > capacity) keeps the first `pair_capacity` pairs in
depth-rank order and reports the overflow count so the driver can grow the
buffer between jit calls.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import ProjectedGaussians


class AlignedBinning(NamedTuple):
    """Chunk-aligned per-tile pair layout for the Pallas kernels.

    Every tile's pair range starts at a multiple of `chunk` and is padded to
    a multiple of `chunk` with invalid slots, so fixed-size DMA transfers
    never straddle two tiles' ranges (required for masked-free backward
    writes). `pair_gaussian == num_gaussians` marks padding slots.
    """

    pair_gaussian: jax.Array  # (P_al,) int32; == N for padding
    pair_valid: jax.Array  # (P_al,) bool
    tile_start: jax.Array  # (T,) int32, multiples of chunk
    tile_count: jax.Array  # (T,) int32 true (unpadded) counts
    overflow: jax.Array  # scalar int32 pairs dropped (capacity or align)
    # When set (build_aligned_binning), pair_gaussian holds DEPTH-RANK ids:
    # the caller gathers per-Gaussian attributes through gaussian_order
    # first (an N-sized gather) — this drops a column from the hot
    # million-pair table gather.
    gaussian_order: jax.Array | None = None  # (N,) int32 depth argsort
    # presort slot id per sorted pair + per-rank pair offsets in presort
    # slot space — lets the attribute-expansion VJP segment-sum pair
    # gradients with a sort + cumsum instead of a 1M-row scatter-add
    # (TPU scatter costs ~11ms base + ~0.7ms/column at this size). Rank r's
    # pairs occupy presort slots [offsets_ext[r], offsets_ext[r+1]);
    # inv_order maps an ORIGINAL Gaussian index to its depth rank, so the
    # VJP can emit per-Gaussian sums directly in original row order.
    pair_slot: jax.Array | None = None  # (P_al,) int32
    offsets_ext: jax.Array | None = None  # (N+1,) int32 unclipped
    inv_order: jax.Array | None = None  # (N,) int32, inverse of gaussian_order


def tile_rect(
    mean2d: jax.Array,
    radius_x: jax.Array,
    tile_h: int,
    tile_w: int,
    n_tiles_y: int,
    n_tiles_x: int,
    row_tile_offset=0,
    radius_y: jax.Array | None = None,
):
    """Tile-rectangle [min, max) each Gaussian touches (CUDA getRect),
    generalized to per-axis half-extents (projection.py radius_x/radius_y;
    pass the scalar radius for both to replicate CUDA's square rect).

    Returns (xmin, xmax, ymin, ymax) int32 arrays; empty rect when the
    radius is 0. Shared by the oracle and the Pallas path so binning
    semantics are identical. `row_tile_offset` shifts the rect into a local
    row band (row-sharded rendering): the result is the intersection of the
    global rect with rows [offset, offset + n_tiles_y).
    """
    if radius_y is None:
        radius_y = radius_x
    mx, my = mean2d[..., 0], mean2d[..., 1]
    empty = (radius_x <= 0) | (radius_y <= 0)
    xmin = jnp.clip(jnp.floor((mx - radius_x) / tile_w), 0, n_tiles_x).astype(jnp.int32)
    xmax = jnp.clip(
        jnp.floor((mx + radius_x + tile_w - 1) / tile_w), 0, n_tiles_x
    ).astype(jnp.int32)
    ymin = jnp.clip(
        jnp.floor((my - radius_y) / tile_h) - row_tile_offset, 0, n_tiles_y
    ).astype(jnp.int32)
    ymax = jnp.clip(
        jnp.floor((my + radius_y + tile_h - 1) / tile_h) - row_tile_offset, 0, n_tiles_y
    ).astype(jnp.int32)
    xmax = jnp.where(empty, xmin, xmax)
    ymax = jnp.where(empty, ymin, ymax)
    return xmin, xmax, ymin, ymax


def _rank_in_sorted(offsets: jax.Array, length: int) -> jax.Array:
    """For sorted int offsets (N,), return r (length,) with
    r[p] == searchsorted(offsets, p, 'right') — via scatter-add + cumsum,
    which is ~400x faster than jnp.searchsorted's scan lowering on TPU for
    millions of queries."""
    counts = jnp.zeros((length,), jnp.int32).at[jnp.clip(offsets, 0, length - 1)].add(
        jnp.where((offsets >= 0) & (offsets < length), 1, 0)
    )
    below = jnp.sum(offsets < 0)  # offsets before the range count everywhere
    # NOTE: keep jnp.cumsum — lax.associative_scan's Hillis-Steele stages
    # lower as ~20 UNFUSED slice+pad+add ops (~0.85 ms each at this size,
    # +9 ms/step measured r4); XLA's cumsum lowering is faster here.
    return jnp.cumsum(counts) + below


def _analytic_tile_counts(
    xmin, ymin, sx, sy, span_eff, n_tiles_y, n_tiles_x
):
    """Exact per-tile pair counts WITHOUT a million-pair histogram scatter.

    The pairs enumerated for Gaussian g are the first `span_eff[g]` cells of
    its tile rect in row-major order: `rows_full` complete rows plus one
    partial row of `rem` cells. Each (partial) rectangle contributes +-1 at
    its four corners of a 2D difference grid; the per-tile counts are the
    2D inclusive prefix sum of that grid. The corner deltas (8 per
    Gaussian) are aggregated with a small sort + cumsum + searchsorted —
    ~8N items instead of a scatter-add over every pair (TPU scatter-add
    costs ~9 ms per million updates; this whole path is ~1 ms at N=100k).
    """
    n = xmin.shape[0]
    sxm = jnp.maximum(sx, 1)
    # rows_full = span_eff // sx via the float-reciprocal trick (int div has
    # no VPU hardware); exact while span_eff < 2^22 (see decode below)
    rows_full = jnp.floor(
        (span_eff.astype(jnp.float32) + 0.5) / sxm.astype(jnp.float32)
    ).astype(jnp.int32)
    rem = span_eff - rows_full * sxm

    gy = n_tiles_y + 2
    gx = n_tiles_x + 2

    def corner_ids(y0, x0, hh, ww):
        """Corner (id, delta) quadruple of rect [y0, y0+hh) x [x0, x0+ww)."""
        y1 = y0 + hh
        x1 = x0 + ww
        ids = jnp.stack(
            [y0 * gx + x0, y0 * gx + x1, y1 * gx + x0, y1 * gx + x1], axis=0
        )
        deltas = jnp.stack(
            [
                jnp.ones((n,), jnp.int32),
                -jnp.ones((n,), jnp.int32),
                -jnp.ones((n,), jnp.int32),
                jnp.ones((n,), jnp.int32),
            ],
            axis=0,
        )
        return ids.reshape(-1), deltas.reshape(-1)

    ids1, d1 = corner_ids(ymin, xmin, rows_full, sx)
    ids2, d2 = corner_ids(ymin + rows_full, xmin, jnp.ones((n,), jnp.int32), rem)
    ids = jnp.concatenate([ids1, ids2])
    deltas = jnp.concatenate([d1, d2])

    # pack the +-1 delta into the key's low bit (deltas are only ever +-1):
    # a single-array sort is measurably cheaper than key+payload at 8N
    packed = jax.lax.sort(
        ids * 2 + jnp.right_shift(deltas + 1, 1), is_stable=False
    )
    sorted_d = jnp.bitwise_and(packed, 1) * 2 - 1
    csum = jnp.cumsum(sorted_d)
    cpad = jnp.concatenate([jnp.zeros((1,), jnp.int32), csum])
    bounds = jnp.searchsorted(
        packed, jnp.arange(gy * gx + 1, dtype=jnp.int32) * 2, side="left"
    )
    grid = (cpad[bounds[1:]] - cpad[bounds[:-1]]).reshape(gy, gx)
    counts2d = jnp.cumsum(jnp.cumsum(grid, axis=0), axis=1)
    return counts2d[:n_tiles_y, :n_tiles_x].reshape(-1)


def build_aligned_binning(
    proj: ProjectedGaussians,
    *,
    tile_h: int,
    tile_w: int,
    n_tiles_y: int,
    n_tiles_x: int,
    pair_capacity: int,
    chunk: int,
    num_gaussians: int,
    row_tile_offset=0,
) -> AlignedBinning:
    """Single-pass aligned binning: chunk-alignment padding pairs are
    synthesized BEFORE the sort (per-tile counts come from a histogram that
    needs no sort), so one lexicographic sort directly yields the aligned
    per-tile layout — this replaces the separate align_binning pass, which
    cost ~2x the rest of binning in re-rank + gathers.

    Depth ordering comes from a PRE-sort of the N Gaussians by view depth
    (stable argsort, ties = index order — exactly the oracle's ordering):
    pairs are then expanded in depth-rank order, so the big pair sort needs
    only a single stable int32 tile key — the within-tile depth order rides
    along on stability. This halves the comparator work of the old
    (tile, depth_bits) two-key sort on a 10x larger array."""
    n_tiles = n_tiles_y * n_tiles_x
    dorder = jnp.argsort(
        jnp.where(proj.valid, proj.depth, jnp.inf), stable=True
    ).astype(jnp.int32)
    rx = proj.radius if proj.radius_x is None else proj.radius_x
    ry = proj.radius if proj.radius_y is None else proj.radius_y
    # ONE (N, 8) permute instead of four narrow takes: each ~100k-row take
    # costs ~0.4 ms of fixed gather overhead on v5e; fused they cost one.
    gtab = jnp.stack(
        [proj.mean2d[:, 0], proj.mean2d[:, 1], rx, ry,
         proj.valid.astype(jnp.float32), jnp.zeros_like(rx),
         jnp.zeros_like(rx), jnp.zeros_like(rx)],
        axis=1,
    )
    gtab = jnp.take(gtab, dorder, axis=0)
    mean2d_s = gtab[:, 0:2]
    rx_s = gtab[:, 2]
    ry_s = gtab[:, 3]
    valid_s = gtab[:, 4] > 0.0
    xmin, xmax, ymin, ymax = tile_rect(
        mean2d_s, rx_s, tile_h, tile_w, n_tiles_y, n_tiles_x,
        row_tile_offset, radius_y=ry_s,
    )
    sx = jnp.maximum(xmax - xmin, 0)
    sy = jnp.maximum(ymax - ymin, 0)
    span = jnp.where(valid_s, sx * sy, 0)  # (N,)

    offsets = jnp.cumsum(span) - span
    total = offsets[-1] + span[-1] if span.shape[0] > 0 else jnp.zeros((), jnp.int32)
    overflow = jnp.maximum(total - pair_capacity, 0)

    p = jnp.arange(pair_capacity, dtype=jnp.int32)
    g = _rank_in_sorted(offsets, pair_capacity).astype(jnp.int32) - 1
    g = jnp.clip(g, 0, span.shape[0] - 1)

    # 4-column pair table. span and the original Gaussian id are NOT
    # needed per pair: offsets are a gapless cumsum, so every p < total has
    # local ∈ [0, span) automatically, and pairs carry depth-RANK ids (the
    # caller indirects per-Gaussian attributes through `gaussian_order`).
    table = jnp.stack([offsets, xmin, ymin, sx], axis=1)
    # barrier: stop XLA fusing producers into the 1M-index gather (compile
    # time explosion otherwise)
    table, g = jax.lax.optimization_barrier((table, g))
    rows = table[g]
    # One explicit transpose to the compact (4, P) layout before extracting
    # columns: the gathered (P, 4) row-major array is lane-PADDED 4 -> 128
    # on TPU (~370 MB at bench scale), and the column-extraction fusion
    # re-reads that padded buffer once PER column (~0.45 ms each). The
    # transpose reads it once and writes 11.5 MB; the decode then runs on
    # compact 1-D arrays. Measured: decode 1.96 -> ~0.6 ms (PERF_NOTES r5).
    # (the reshape through 1-D forces the copy to actually materialize —
    # a bare rows.T is a free layout re-label that leaves the reads padded)
    p_cap = rows.shape[0]
    rows_t = jax.lax.optimization_barrier(rows.T.reshape(-1))
    off_g = rows_t[0 * p_cap : 1 * p_cap]
    xmin_g = rows_t[1 * p_cap : 2 * p_cap]
    ymin_g = rows_t[2 * p_cap : 3 * p_cap]
    sx_g = rows_t[3 * p_cap : 4 * p_cap]

    local = p - off_g
    pvalid = p < total
    # local // sx and local % sx via float reciprocal: int32 div/mod has no
    # VPU hardware and costs ~20ms at 1M pairs. The +0.5 offset keeps the
    # floor exact: (local + 0.5)/sx is computed in f32; exactness needs
    # local + 0.5 representable AND 0.5*ulp((local+0.5)/sx) < 0.5/sx, both
    # of which hold while local < 2^22 (span <= n_tiles, so any grid up to
    # ~4M tiles is safe; an 8K x 8K image has ~65K (8,128)-tiles).
    sxm = jnp.maximum(sx_g, 1)
    lrow = jnp.floor(
        (local.astype(jnp.float32) + 0.5) / sxm.astype(jnp.float32)
    ).astype(jnp.int32)
    tx = xmin_g + (local - lrow * sxm)
    ty = ymin_g + lrow
    tile = jnp.where(pvalid, ty * n_tiles_x + tx, n_tiles).astype(jnp.int32)
    gg = jnp.where(pvalid, g, num_gaussians)
    # barrier: `tile` feeds the concat and the sort; without it XLA
    # re-fuses (and re-computes) the whole decode per consumer
    tile, gg = jax.lax.optimization_barrier((tile, gg))

    # per-tile counts, computed ANALYTICALLY from the rects (corner-delta
    # trick) instead of a histogram scatter over every pair. `span_eff`
    # restricts each Gaussian to the pairs that actually fit the capacity
    # (enumeration above stops at p == min(total, capacity)).
    span_eff = jnp.clip(pair_capacity - offsets, 0, span)
    counts = _analytic_tile_counts(
        xmin, ymin, sx, sy, span_eff, n_tiles_y, n_tiles_x
    )
    pad = (-counts) % chunk
    padded_counts = counts + pad
    aligned_start = (jnp.cumsum(padded_counts) - padded_counts).astype(jnp.int32)

    # synthesize padding pairs STATICALLY: slot j belongs to tile j // chunk
    # (each tile needs at most chunk-1 pads), active iff (j % chunk) is
    # below that tile's pad count. With chunk a power of two this is two
    # bit-ops + one small (T,)-table gather — no rank/cumsum machinery.
    n_pad_slots = n_tiles * chunk
    j = jnp.arange(n_pad_slots, dtype=jnp.int32)
    shift = int(chunk).bit_length() - 1
    assert chunk == 1 << shift, "chunk must be a power of two"
    t_pad = jnp.right_shift(j, shift)
    pad_ok = jnp.bitwise_and(j, chunk - 1) < pad[t_pad]
    tile_pad = jnp.where(pad_ok, t_pad, n_tiles).astype(jnp.int32)

    tile_all = jnp.concatenate([tile, tile_pad])
    g_all = jnp.concatenate([gg, jnp.full((n_pad_slots,), num_gaussians, jnp.int32)])

    # ONE tile-key sort: real pairs are already in depth-rank order and
    # padding pairs follow them, so a stable sort finishes the job. When
    # (tile, slot) fits 31 bits the two are packed into a single UNIQUE
    # int32 key and sorted unstably with one payload — measurably cheaper
    # than the stable 2-payload comparator at bench scale. The slot id
    # rides in the key's low bits (the expansion VJP sorts pair gradients
    # back by it; slots are unique, so that sort exactly inverts this one).
    iota_all = jnp.arange(tile_all.shape[0], dtype=jnp.int32)
    slot_bits = int(tile_all.shape[0] - 1).bit_length()
    if slot_bits + int(n_tiles).bit_length() <= 31:
        packed = jnp.bitwise_or(jnp.left_shift(tile_all, slot_bits), iota_all)
        key, sorted_g = jax.lax.sort((packed, g_all), num_keys=1, is_stable=False)
        sorted_slot = jnp.bitwise_and(key, (1 << slot_bits) - 1)
    else:
        _, sorted_g, sorted_slot = jax.lax.sort(
            (tile_all, g_all, iota_all), num_keys=1, is_stable=True
        )
    offsets_ext = jnp.concatenate([offsets, total[None]])
    # inverse of the depth permutation: one small (N,) sort — the expansion
    # VJP uses it to emit per-Gaussian gradient sums directly in original
    # row order, replacing the depth-permute's (N,16) scatter-add VJP
    inv_order = jnp.argsort(dorder).astype(jnp.int32)
    return AlignedBinning(
        pair_gaussian=sorted_g,
        pair_valid=sorted_g < num_gaussians,
        tile_start=aligned_start,
        tile_count=counts,
        overflow=overflow,
        gaussian_order=dorder,
        pair_slot=sorted_slot,
        offsets_ext=offsets_ext,
        inv_order=inv_order,
    )
