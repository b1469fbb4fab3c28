"""Learning-rate schedules.

`expon_lr` reproduces the Plenoxels/JaxNeRF log-linear decay with optional
sine delay warmup used by the reference for Gaussian positions
(utils/general_utils.py:109-142), but as a jit-safe function of a (possibly
traced) step so it can live inside an optax schedule.
"""
from __future__ import annotations

import jax.numpy as jnp


def expon_lr(
    step,
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
):
    """Log-linearly interpolated LR: lr_init at step 0 -> lr_final at max_steps."""
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, jnp.float32))
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    lr = delay_rate * log_lerp
    return jnp.where(step < 0, 0.0, lr)


def make_expon_lr_schedule(
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
):
    """Returns an optax-compatible schedule fn step -> lr."""

    def schedule(step):
        return expon_lr(step, lr_init, lr_final, lr_delay_steps, lr_delay_mult, max_steps)

    return schedule
