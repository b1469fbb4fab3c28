"""The jitted training step — functional replacement of the reference hot
loop body (train.py:61-157): render -> loss -> backward -> Adam step ->
densification-stat accumulation, all inside one XLA computation.

Differences from the reference that are deliberate TPU-first design:
  * derived state (mesh alpha/scaling/rotation) is recomputed inside the
    loss fn instead of post-step hooks (train.py:154-157) — same math, but
    gradients and XLA fusion see one straight-line program;
  * screen-space positional gradients arrive as the gradient w.r.t. an
    all-zeros `mean2d_offset` input rather than a retained `.grad` side
    channel (renderer/gaussian_renderer/__init__.py:32-37);
  * the SH degree warm-up (train.py:85-87) keeps static shapes by masking
    coefficients above the active degree instead of re-compiling per degree.
"""
from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..core.camera import Camera
from ..renderer import render
from .loss import photometric_loss, psnr
from .state import TrainState


def sh_degree_mask(shs: jax.Array, active_degree: jax.Array) -> jax.Array:
    """Zero coefficients above the active SH degree (jit-safe warm-up)."""
    k_idx = jnp.arange(shs.shape[-1])
    return shs * (k_idx < (active_degree + 1) ** 2)


def one_up_sh_degree(state: TrainState, max_degree: int) -> TrainState:
    """train.py:85-87 / gaussian_model.py:120-122."""
    return state.replace(
        active_sh_degree=jnp.minimum(state.active_sh_degree + 1, max_degree)
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    config,
    sh_degree_max: int,
    backend: str = "reference",
    to_bag_kwargs: Callable[[TrainState], dict] | None = None,
    render_kwargs: dict | None = None,
) -> Callable:
    """Build the jitted step fn: (state, cam, gt, bg) -> (state, metrics).

    `model` is a registry module exposing to_bag. `gt` is (H, W, 3).
    `render_kwargs` forward to the rasterizer (e.g. `pair_capacity=` so the
    driver can grow the pair buffer when `metrics["overflow"]` fires).
    """
    render_kwargs = render_kwargs or {}

    @jax.jit
    def train_step(state: TrainState, cam: Camera, gt: jax.Array, bg: jax.Array):
        capacity = state.alive.shape[0]

        def loss_fn(params, mean2d_offset):
            mstate = {"params": params, "consts": state.consts, "alive": state.alive}
            extra = to_bag_kwargs(state) if to_bag_kwargs else {}
            bag = model.to_bag(mstate, **extra)
            bag = bag.replace(shs=sh_degree_mask(bag.shs, state.active_sh_degree))
            out = render(
                bag,
                cam,
                bg,
                sh_degree=sh_degree_max,
                backend=backend,
                mean2d_offset=mean2d_offset,
                **render_kwargs,
            )
            total, l1 = photometric_loss(out.image, gt, config.lambda_dssim)
            return total, (out, l1)

        offset = jnp.zeros((capacity, 2), jnp.float32)
        (loss, (out, l1)), (g_params, g_offset) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, offset)

        updates, new_opt_state = tx.update(g_params, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # densification statistics (gaussian_model.py:416-418): accumulate
        # the norm of the NDC-space positional gradient for visible rows.
        # The reference's dL/dmean2D is the pixel gradient scaled by
        # (0.5 W, 0.5 H) — the CUDA backward's ddelx_dx factor.
        visible = out.radii > 0
        scale_vec = jnp.array([0.5 * cam.width, 0.5 * cam.height], jnp.float32)
        gnorm = jnp.linalg.norm(g_offset * scale_vec, axis=-1)
        stats = state.stats
        stats = stats.replace(
            grad_accum=stats.grad_accum + jnp.where(visible, gnorm, 0.0),
            denom=stats.denom + visible.astype(jnp.float32),
            max_radii=jnp.maximum(stats.max_radii, out.radii.astype(jnp.float32)),
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
            # pairs silently dropped by the rasterizer's capacity-bounded
            # binning this step — nonzero means visible Gaussians are being
            # cut from the render; the driver must grow pair_capacity.
            "overflow": out.overflow
            if out.overflow is not None
            else jnp.zeros((), jnp.int32),
        }
        return new_state, metrics

    return train_step


def make_eval_render(
    model,
    sh_degree_max: int,
    backend: str = "reference",
) -> Callable:
    """Jitted eval render: (state, cam, bg) -> image (H, W, 3)."""

    @jax.jit
    def eval_render(state: TrainState, cam: Camera, bg: jax.Array):
        mstate = {"params": state.params, "consts": state.consts, "alive": state.alive}
        bag = model.to_bag(mstate)
        bag = bag.replace(shs=sh_degree_mask(bag.shs, state.active_sh_degree))
        out = render(bag, cam, bg, sh_degree=sh_degree_max, backend=backend)
        return jnp.clip(out.image, 0.0, 1.0)

    return eval_render
