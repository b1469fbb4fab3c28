"""Sharded TRAINING steps: row- (tile/pixel) and Gaussian- (model) sharded
rendering wired into the full train step — loss, backward, Adam update and
densification statistics — over a `jax.sharding.Mesh` (SURVEY.md §2.3).

Design: ONE `shard_map` wraps the whole step. Each device renders only its
portion (a tile-row band, or a contiguous depth slab of the Gaussians), the
portions meet in a single `lax.all_gather` riding ICI, and every device
computes the (replicated) loss on the assembled image. Autodiff through
the all_gather routes each portion's image cotangent back to its producer,
so parameter gradients need exactly one `psum` over the shard axis — the
same collective count as plain DP.

Composed 2-D parallelism (`data` x `model`): cameras shard over `data`,
Gaussians over `model`; gradients psum over `model` (reassemble one
camera's gradient) then pmean over `data` (average cameras), exactly
mirroring make_dp_train_step's semantics (data_parallel.py).

SSIM note: the loss runs on the ASSEMBLED image, so windowed SSIM sees
the true cross-band windows — sharded and unsharded training losses are
identical up to kernel reassociation, not just approximately.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..core.camera import Camera, take_camera
from ..models.gaussian_bag import GaussianBag
from ..ops.rasterize_pallas import TILE_H, rasterize_pallas
from ..ops.rasterize_reference import RenderOutput
from ..train.loop import sh_degree_mask
from ..train.loss import photometric_loss, psnr
from ..train.state import TrainState


def _render_rows_full(
    bag: GaussianBag,
    offset: jax.Array,
    cam: Camera,
    bg: jax.Array,
    sh_degree: int,
    axis_name: str,
    n_dev: int,
    render_kwargs: dict,
) -> RenderOutput:
    """Inside-shard_map row-band render + all_gather assembly.

    Each device composites tile rows [idx*rows_per, (idx+1)*rows_per); the
    band images meet in one all_gather and every device returns the full
    (H, W, 3) image (replicated across the axis). Per-Gaussian outputs
    (radii, mean2d) are computed identically on every device by the
    replicated preprocess."""
    idx = jax.lax.axis_index(axis_name)
    hp = -(-cam.height // TILE_H) * TILE_H
    total_tiles_y = hp // TILE_H
    rows_per = -(-total_tiles_y // n_dev)
    out = rasterize_pallas(
        bag.xyz, bag.scaling, bag.rotation, bag.opacity, cam,
        bg=bg, shs=bag.shs, sh_degree=sh_degree, alive=bag.alive,
        mean2d_offset=offset,
        num_row_tiles=rows_per, row_tile_offset=idx * rows_per,
        **render_kwargs,
    )
    # (D, band, W, 5): rgb | depth | alpha
    part = jnp.concatenate(
        [out.image, out.depth[..., None], out.alpha[..., None]], axis=-1
    )
    parts = jax.lax.all_gather(part, axis_name)
    full = parts.reshape(-1, cam.width, 5)[: cam.height]
    overflow = jax.lax.psum(out.overflow, axis_name)
    return RenderOutput(
        image=full[..., :3], radii=out.radii, depth=full[..., 3],
        alpha=full[..., 4], mean2d=out.mean2d, overflow=overflow,
    )


def _render_gaussians_full(
    bag: GaussianBag,
    offset: jax.Array,
    cam: Camera,
    bg: jax.Array,
    sh_degree: int,
    axis_name: str,
    n_dev: int,
    render_kwargs: dict,
) -> RenderOutput:
    """Inside-shard_map depth-slab render + ordered compositing merge.

    Gaussians are sorted front-to-back (replicated argsort — identical on
    every device) and dealt in contiguous depth slabs; each device
    composites its slab pre-background, the (rgb, T, depth) partials meet
    in one all_gather, and the ordered over-operator group identity
        C = sum_i (prod_{j<i} T_j) C_i,   T = prod_i T_i
    merges them exactly (up to the early-termination tail at saturated
    pixels — bound and measurement in parallel/gaussian_sharded.py's
    module docstring)."""
    idx = jax.lax.axis_index(axis_name)
    n = bag.xyz.shape[0]
    per = -(-n // n_dev)
    pad = per * n_dev - n

    wv = cam.world_view
    z = bag.xyz @ wv[2, :3] + wv[2, 3]
    z = jnp.where(bag.alive, z, jnp.inf)
    order = jnp.argsort(z)
    iperm = jnp.argsort(order)  # inverse: global id -> depth rank

    def slab(x, fill=None):
        x = jnp.take(x, order, axis=0)
        if pad:
            tail = x[-1:] if fill is None else jnp.full(
                (1,) + x.shape[1:], fill, x.dtype
            )
            x = jnp.concatenate([x, jnp.broadcast_to(tail, (pad,) + x.shape[1:])])
        return jax.lax.dynamic_slice_in_dim(x, idx * per, per)

    alive_sorted = jnp.take(bag.alive, order)
    if pad:
        alive_sorted = jnp.concatenate([alive_sorted, jnp.zeros((pad,), bool)])
    alive_slab = jax.lax.dynamic_slice_in_dim(alive_sorted, idx * per, per)

    out = rasterize_pallas(
        slab(bag.xyz), slab(bag.scaling), slab(bag.rotation), slab(bag.opacity),
        cam,
        bg=jnp.zeros((3,), jnp.float32),  # partials are pre-background
        shs=slab(bag.shs), sh_degree=sh_degree, alive=alive_slab,
        mean2d_offset=slab(offset),
        **render_kwargs,
    )
    t = 1.0 - out.alpha
    part = jnp.concatenate(
        [out.image, t[..., None], out.depth[..., None]], axis=-1
    )
    parts = jax.lax.all_gather(part, axis_name)  # (D, H, W, 5)
    color = parts[..., :3]
    t_all = parts[..., 3]
    d_all = parts[..., 4]
    t_excl = jnp.concatenate(
        [jnp.ones_like(t_all[:1]), jnp.cumprod(t_all[:-1], axis=0)], axis=0
    )
    image = jnp.sum(t_excl[..., None] * color, axis=0)
    depth = jnp.sum(t_excl * d_all, axis=0)
    t_total = t_excl[-1] * t_all[-1]
    image = image + t_total[..., None] * bg

    # reassemble per-Gaussian outputs: gather slabs -> depth order -> undo
    radii_all = jax.lax.all_gather(out.radii, axis_name).reshape(-1)[:n]
    mean2d_all = jax.lax.all_gather(out.mean2d, axis_name).reshape(-1, 2)[:n]
    overflow = jax.lax.psum(out.overflow, axis_name)
    return RenderOutput(
        image=image,
        radii=jnp.take(radii_all, iperm),
        depth=depth,
        alpha=1.0 - t_total,
        mean2d=jnp.take(mean2d_all, iperm, axis=0),
        overflow=overflow,
    )


_PORTION_RENDERERS = {
    "rows": _render_rows_full,
    "gaussians": _render_gaussians_full,
}


def make_sharded_train_step(
    model,
    tx: optax.GradientTransformation,
    config,
    sh_degree_max: int,
    mesh: Mesh,
    shard: str = "gaussians",
    model_axis: str | None = None,
    data_axis: str | None = None,
    render_kwargs: dict | None = None,
) -> Callable:
    """Build a jitted sharded step: (state, cam[, cams_batch], gt, bg) ->
    (state, metrics).

    `shard` in {"rows", "gaussians"} picks the model-parallel axis. With a
    1-axis mesh the single axis is the shard axis and the step signature
    matches make_train_step (one camera). When `data_axis` names a second
    mesh axis, cameras shard over it (stacked Camera pytree + (B, H, W, 3)
    gts, B == mesh.shape[data_axis]) and the step composes DP x model
    parallelism on the 2-D mesh.
    """
    render_portion = _PORTION_RENDERERS[shard]
    render_kwargs = render_kwargs or {}
    if model_axis is None:
        model_axis = mesh.axis_names[-1]
    n_model = mesh.shape[model_axis]
    composed = data_axis is not None

    def per_device(state: TrainState, cam_in, gt_in, bg):
        if composed:
            cam = take_camera(cam_in, 0)
            gt = gt_in[0]
        else:
            cam, gt = cam_in, gt_in
        capacity = state.alive.shape[0]

        def loss_fn(params, mean2d_offset):
            mstate = {"params": params, "consts": state.consts, "alive": state.alive}
            bag = model.to_bag(mstate)
            bag = bag.replace(shs=sh_degree_mask(bag.shs, state.active_sh_degree))
            out = render_portion(
                bag, mean2d_offset, cam, bg, sh_degree_max,
                model_axis, n_model, render_kwargs,
            )
            total, l1 = photometric_loss(out.image, gt, config.lambda_dssim)
            return total, (out, l1)

        offset = jnp.zeros((capacity, 2), jnp.float32)
        (loss, (out, l1)), (g_params, g_offset) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, offset)

        # reassemble the portion gradients: the all_gather's reverse
        # (psum-scatter) already routed image cotangents back to their
        # producers, but it also SUMMED the cotangents of all n_model
        # replicated loss computations — so the cross-portion reassembly
        # must be a pmean (psum / n_model), not a psum, to recover the
        # single-loss gradient.
        g_params = jax.lax.pmean(g_params, model_axis)
        g_offset = jax.lax.pmean(g_offset, model_axis)
        if composed:
            g_params = jax.lax.pmean(g_params, data_axis)

        updates, new_opt_state = tx.update(g_params, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        visible = out.radii > 0
        scale_vec = jnp.array([0.5 * cam.width, 0.5 * cam.height], jnp.float32)
        gnorm = jnp.linalg.norm(g_offset * scale_vec, axis=-1)
        grad_add = jnp.where(visible, gnorm, 0.0)
        denom_add = visible.astype(jnp.float32)
        radii_max = out.radii.astype(jnp.float32)
        if composed:  # accumulate the camera batch (data_parallel.py:69-76)
            grad_add = jax.lax.psum(grad_add, data_axis)
            denom_add = jax.lax.psum(denom_add, data_axis)
            radii_max = jax.lax.pmax(radii_max, data_axis)

        stats = state.stats
        stats = stats.replace(
            grad_accum=stats.grad_accum + grad_add,
            denom=stats.denom + denom_add,
            max_radii=jnp.maximum(stats.max_radii, radii_max),
        )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            stats=stats,
        )
        metrics = {
            "loss": loss,
            "l1": l1,
            "psnr": psnr(out.image, gt),
            "num_visible": jnp.sum(visible),
            "overflow": out.overflow,
        }
        if composed:
            metrics = {
                k: (jax.lax.psum(v, data_axis) if k in ("overflow", "num_visible")
                    else jax.lax.pmean(v, data_axis))
                for k, v in metrics.items()
            }
        return new_state, metrics

    cam_spec = P(data_axis) if composed else P()
    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), cam_spec, cam_spec, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
