"""Camera-data-parallel training step.

Each device renders its own camera(s) against replicated parameters;
gradients (and densification statistics) are all-reduced over the `data`
mesh axis before a replicated optimizer update — the standard DP recipe,
expressed with `jax.shard_map` so XLA inserts the psum collectives over
ICI/DCN (SURVEY.md §2.3).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.camera import Camera, take_camera
from ..renderer import render
from ..train.loop import sh_degree_mask
from ..train.loss import photometric_loss, psnr
from ..train.state import TrainState


def make_dp_train_step(
    model,
    tx: optax.GradientTransformation,
    config,
    sh_degree_max: int,
    mesh: Mesh,
    backend: str = "reference",
    axis_name: str = "data",
) -> Callable:
    """Build a jitted DP step: (state, cams_batch, gts_batch, bg) ->
    (state, metrics).

    `cams_batch` is a stacked Camera pytree and `gts_batch` a (B, H, W, 3)
    array, B == mesh size (one camera per device per step; pass multiple
    steps' worth by looping — cameras are cheap to stack).
    """

    def per_device(state: TrainState, cam_shard: Camera, gt_shard: jax.Array, bg: jax.Array):
        cam = take_camera(cam_shard, 0)
        gt = gt_shard[0]
        capacity = state.alive.shape[0]

        def loss_fn(params, mean2d_offset):
            mstate = {"params": params, "consts": state.consts, "alive": state.alive}
            bag = model.to_bag(mstate)
            bag = bag.replace(shs=sh_degree_mask(bag.shs, state.active_sh_degree))
            out = render(
                bag, cam, bg,
                sh_degree=sh_degree_max, backend=backend, mean2d_offset=mean2d_offset,
            )
            total, l1 = photometric_loss(out.image, gt, config.lambda_dssim)
            return total, (out, l1)

        offset = jnp.zeros((capacity, 2), jnp.float32)
        (loss, (out, l1)), (g_params, g_offset) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, offset)

        # gradient all-reduce over cameras — the only collective in DP
        g_params = jax.lax.pmean(g_params, axis_name)

        updates, new_opt_state = tx.update(g_params, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # densification stats: SUM over the camera batch (each reference
        # iteration accumulates one camera, gaussian_model.py:416-418)
        visible = out.radii > 0
        scale_vec = jnp.array([0.5 * cam.width, 0.5 * cam.height], jnp.float32)
        gnorm = jnp.linalg.norm(g_offset * scale_vec, axis=-1)
        grad_add = jax.lax.psum(jnp.where(visible, gnorm, 0.0), axis_name)
        denom_add = jax.lax.psum(visible.astype(jnp.float32), axis_name)
        radii_max = jax.lax.pmax(out.radii.astype(jnp.float32), axis_name)

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
            "loss": jax.lax.pmean(loss, axis_name),
            "l1": jax.lax.pmean(l1, axis_name),
            "psnr": jax.lax.pmean(psnr(out.image, gt), axis_name),
        }
        return new_state, metrics

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
