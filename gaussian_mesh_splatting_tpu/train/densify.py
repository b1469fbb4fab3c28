"""Adaptive density control on fixed-capacity padded buffers.

The reference mutates tensor sizes and performs Adam-state surgery in place
(scene/gaussian_model.py:269-414). Under jit/XLA, shapes must be static, so
this module reimplements clone/split/prune as a *recompaction*: survivors
and newly created rows are gathered into the same capacity-C buffers via a
single permutation, with optimizer moments gathered alongside (zeros for
new rows — matching cat_tensors_to_optimizer, gaussian_model.py:318-338).

Semantics mirrored exactly (gaussian_model.py:360-414 and the flat variant
games/flat_splatting/scene/flat_gaussian_model.py:62-88):

  clone  : avg grad >= threshold AND max scale <= percent_dense * extent
           -> duplicate the row;
  split  : avg grad >= threshold AND max scale >  percent_dense * extent
           -> 2 samples ~ N(xyz, Sigma), scale /= 1.6, original pruned;
  prune  : opacity < min_opacity, or (when size_threshold) screen radius >
           threshold or world scale > 0.1 * extent;
  reset  : opacity <- min(opacity, 0.01) with zeroed Adam moments
           (gaussian_model.py:218-221, 269-282).

When candidates exceed free capacity, clones win over splits (lower-risk
growth) and overflow is dropped — logged by the caller via the returned
counts. The buffer can be re-allocated larger between jit calls by the
host-side `grow_capacity`.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..core.transforms import inverse_sigmoid, quat_to_rotmat
from .state import DensifyStats, TrainState


def _gather_rows(tree: Any, idx: jax.Array, is_new: jax.Array, capacity: int) -> Any:
    """Gather rows of every Gaussian-indexed leaf by `idx` (mod capacity into
    the original buffer), zeroing rows marked new. Non-row leaves (e.g. Adam
    step counters, scalars) pass through."""

    def gather(leaf):
        if not hasattr(leaf, "ndim") or leaf.ndim == 0 or leaf.shape[0] != capacity:
            return leaf
        src = leaf[idx % capacity]
        zero_mask = is_new.reshape((-1,) + (1,) * (leaf.ndim - 1))
        return jnp.where(zero_mask, jnp.zeros_like(src), src)

    return jax.tree.map(gather, tree)


@functools.partial(jax.jit, static_argnames=("scaling_cols", "n_split"))
def densify_and_prune(
    state: TrainState,
    key: jax.Array,
    *,
    grad_threshold: float,
    min_opacity: float,
    extent: float,
    percent_dense: float,
    size_threshold: float,  # 0 disables screen/world-size pruning
    scaling_cols: int,  # 3 for gs, 2 for gs_flat
    n_split: int = 2,
) -> tuple[TrainState, dict]:
    """One density-control event. Returns (new_state, info counts)."""
    p = state.params
    capacity = state.alive.shape[0]
    alive = state.alive

    grads = state.stats.grad_accum / jnp.maximum(state.stats.denom, 1.0)
    grads = jnp.where(jnp.isnan(grads), 0.0, grads)

    scaling_act = jnp.exp(p["scaling"])  # (C, scaling_cols)
    max_scale = jnp.max(scaling_act, axis=-1)
    opacity_act = jax.nn.sigmoid(p["opacity"][:, 0])

    opacity_prune = alive & (opacity_act < min_opacity)
    big_vs = state.stats.max_radii > size_threshold
    big_ws = max_scale > 0.1 * extent
    prune_mask = jnp.where(
        size_threshold > 0, opacity_prune | (alive & (big_vs | big_ws)),
        opacity_prune,
    )

    # Only OPACITY-pruned rows are excluded from densification: their
    # clones/split-children inherit the disqualifying opacity and would be
    # pruned within the same reference call (gaussian_model.py:400-412).
    # SIZE-pruned rows (screen radius > 20 px / world extent) must still
    # densify — in the reference their children survive the same-pass
    # prune because densification_postfix re-zeroes max_radii2D and split
    # children carry scale/1.6. Excluding them (the r4 behavior) caused a
    # population EXTINCTION at 800x800 scale: after the iteration-3000
    # opacity reset enabled size pruning, nearly every splat exceeded the
    # fixed 20 px screen threshold, was pruned childless each event, and
    # the model collapsed from 47k to 4 Gaussians (caught by the r5
    # at-scale convergence run; regression test in tests/test_densify.py).
    hot = alive & (grads >= grad_threshold) & ~opacity_prune
    clone_mask = hot & (max_scale <= percent_dense * extent)
    split_mask = hot & (max_scale > percent_dense * extent)

    survivors = alive & ~prune_mask & ~split_mask

    # ---- candidate pool: [clones (C), split samples (n_split * C)] -------
    # priority: clones first, then split samples, ordered by grad magnitude
    free = capacity - jnp.sum(survivors)

    def rank(mask):
        # stable priority: valid rows first, higher grad first
        return jnp.where(mask, -grads, jnp.inf)

    clone_rank = rank(clone_mask)
    split_rank = rank(split_mask)

    # split sample geometry (gaussian_model.py:369-374): x = mean + R @ eps,
    # eps ~ N(0, diag(scale)); new scale = old / (0.8 * n_split)
    full_scaling = scaling_act
    if scaling_cols == 2:
        full_scaling = jnp.concatenate(
            [jnp.full((capacity, 1), 1e-8), scaling_act], axis=1
        )
    R = quat_to_rotmat(p["rotation"])
    noise = (
        jax.random.normal(key, (n_split, capacity, 3)) * full_scaling[None, :, :]
    )
    split_xyz = p["xyz"][None] + jnp.einsum("cij,ncj->nci", R, noise)
    split_scaling_act = scaling_act / (0.8 * n_split)
    split_scaling_raw = jnp.log(jnp.maximum(split_scaling_act, 1e-30))

    # ---- allocate free slots --------------------------------------------
    # order candidates: all clones by rank, then all split samples by rank
    clone_order = jnp.argsort(clone_rank)  # (C,) best clones first
    split_order = jnp.argsort(split_rank)
    n_clone = jnp.sum(clone_mask)
    n_split_rows = jnp.sum(split_mask) * n_split

    # budget: clones first
    clone_budget = jnp.minimum(n_clone, free)
    split_budget = jnp.clip(free - clone_budget, 0, None)

    # candidate list of length capacity * (1 + n_split):
    #   entry i < C            -> clone of row clone_order[i], taken if i < clone_budget
    #   entry C + k*C + j      -> split sample k of row split_order[j],
    #                             taken if k*n_split... (interleave instead)
    # Interleave split samples so both copies of the best row come first:
    # flat index m -> sample k = m % n_split, source j = m // n_split.
    m = jnp.arange(n_split * capacity)
    split_src = split_order[m // n_split]
    split_k = m % n_split
    split_taken = (m < split_budget) & (split_rank[split_src] < jnp.inf)

    ci = jnp.arange(capacity)
    clone_src = clone_order[ci]
    clone_taken = (ci < clone_budget) & (clone_rank[clone_src] < jnp.inf)

    # ---- build destination assignment -----------------------------------
    # survivor rows keep their slots; free rows (non-survivors, in row
    # order) get filled with taken candidates in queue order.
    n_surv = jnp.sum(survivors)

    # candidate queue (clones then splits), compacted to taken-only order
    cand_src = jnp.concatenate([clone_src, split_src])  # (C*(1+n_split),)
    cand_taken = jnp.concatenate([clone_taken, split_taken])
    cand_is_split = jnp.concatenate(
        [jnp.zeros_like(clone_taken), jnp.ones_like(split_taken)]
    )
    cand_k = jnp.concatenate([jnp.zeros_like(clone_src), split_k])
    queue = jnp.argsort(~cand_taken, stable=True)  # taken first, stable
    cand_src = cand_src[queue]
    cand_taken = cand_taken[queue]
    cand_is_split = cand_is_split[queue]
    cand_k = cand_k[queue]

    # per-row final source and new-row bookkeeping
    src = jnp.arange(capacity)  # default: keep own row
    is_new = jnp.zeros((capacity,), bool)
    new_alive = survivors

    # fill free rows with the first (capacity) queue entries
    fill_src = cand_src[:capacity]
    fill_taken = cand_taken[:capacity]
    fill_is_split = cand_is_split[:capacity]
    fill_k = cand_k[:capacity]

    # free_rows in row order: positions of zeros in survivors
    order_rows = jnp.argsort(survivors.astype(jnp.int32), stable=True)
    # order_rows[:capacity - n_surv] = free rows (row order)
    fill_pos = order_rows  # only first (capacity - n_surv) are really free
    fidx = jnp.arange(capacity)
    really_fill = (fidx < (capacity - n_surv)) & fill_taken

    src = src.at[fill_pos].set(jnp.where(really_fill, fill_src, fill_pos))
    is_new = is_new.at[fill_pos].set(really_fill)
    new_alive = new_alive.at[fill_pos].set(
        jnp.where(really_fill, True, new_alive[fill_pos])
    )
    took_split = jnp.zeros((capacity,), bool).at[fill_pos].set(
        really_fill & fill_is_split
    )
    sample_k = jnp.zeros((capacity,), jnp.int32).at[fill_pos].set(
        jnp.where(really_fill, fill_k, 0)
    )

    # ---- materialize params ---------------------------------------------
    def copy_rows(leaf):
        if not hasattr(leaf, "ndim") or leaf.ndim == 0 or leaf.shape[0] != capacity:
            return leaf
        return leaf[src]

    new_params = jax.tree.map(copy_rows, p)
    # overwrite split-born rows' xyz/scaling
    sx = split_xyz[sample_k, src]  # (C, 3)
    new_params["xyz"] = jnp.where(took_split[:, None], sx, new_params["xyz"])
    new_params["scaling"] = jnp.where(
        took_split[:, None], split_scaling_raw[src], new_params["scaling"]
    )

    # ---- optimizer moments follow rows; new rows zeroed ------------------
    new_opt_state = _gather_rows(state.opt_state, src, is_new, capacity)

    new_state = state.replace(
        params=new_params,
        opt_state=new_opt_state,
        alive=new_alive,
        stats=DensifyStats.zeros(capacity),
    )
    info = {
        "n_clone": jnp.minimum(n_clone, clone_budget),
        "n_split_rows": jnp.minimum(n_split_rows, split_budget),
        "n_pruned": jnp.sum(alive & (prune_mask | split_mask)),
        "n_alive": jnp.sum(new_alive),
        "overflow": jnp.clip(n_clone + n_split_rows - free, 0, None),
        # prune-reason breakdown (observability: a mass extinction after an
        # opacity reset looks identical to healthy cleanup in n_pruned)
        "n_pruned_opacity": jnp.sum(alive & (opacity_act < min_opacity)),
        "n_pruned_screen": jnp.sum(
            jnp.where(size_threshold > 0, alive & big_vs, False)
        ),
        "n_pruned_world": jnp.sum(
            jnp.where(size_threshold > 0, alive & big_ws, False)
        ),
    }
    return new_state, info


@jax.jit
def reset_opacity(state: TrainState) -> TrainState:
    """opacity <- min(opacity, 0.01), Adam moments zeroed for the opacity
    group (gaussian_model.py:218-221, 269-282)."""
    p = state.params
    new_op = inverse_sigmoid(jnp.minimum(jax.nn.sigmoid(p["opacity"]), 0.01))
    new_params = dict(p, opacity=new_op)

    capacity = state.alive.shape[0]

    def zero_opacity_moments(path, leaf):
        names = [getattr(k, "key", getattr(k, "name", None)) for k in path]
        if "opacity" in names and hasattr(leaf, "ndim") and leaf.ndim > 0 and leaf.shape[0] == capacity:
            return jnp.zeros_like(leaf)
        return leaf

    new_opt_state = jax.tree_util.tree_map_with_path(
        zero_opacity_moments, state.opt_state
    )
    return state.replace(params=new_params, opt_state=new_opt_state)


def grow_capacity(state: TrainState, tx: optax.GradientTransformation, new_capacity: int) -> TrainState:
    """Host-side (non-jit) buffer enlargement: pad every Gaussian-indexed
    array and rebuild the optimizer state, preserving moments for existing
    rows. Triggers a recompile of the jitted step (by design: rare)."""
    capacity = state.alive.shape[0]
    assert new_capacity > capacity
    pad = new_capacity - capacity

    def pad_rows(leaf):
        if not hasattr(leaf, "ndim") or leaf.ndim == 0 or leaf.shape[0] != capacity:
            return leaf
        return jnp.pad(leaf, [(0, pad)] + [(0, 0)] * (leaf.ndim - 1))

    new_params = jax.tree.map(pad_rows, state.params)
    # keep padded rotations unit-ish and scalings tiny (see models.vanilla)
    if "rotation" in new_params:
        new_params["rotation"] = new_params["rotation"].at[capacity:, 0].set(1.0)
    if "scaling" in new_params:
        new_params["scaling"] = new_params["scaling"].at[capacity:].set(-10.0)
    new_opt_state = jax.tree.map(pad_rows, state.opt_state)
    return state.replace(
        params=new_params,
        opt_state=new_opt_state,
        alive=jnp.pad(state.alive, (0, pad)),
        stats=DensifyStats(
            grad_accum=jnp.pad(state.stats.grad_accum, (0, pad)),
            denom=jnp.pad(state.stats.denom, (0, pad)),
            max_radii=jnp.pad(state.stats.max_radii, (0, pad)),
        ),
    )
