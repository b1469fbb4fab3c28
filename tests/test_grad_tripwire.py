"""FAST-TIER gradient tripwire for the Pallas rasterizer backward.

Rounds 3 and 4 each shipped a tree whose backward kernel had a profiling
ablation left in (the gradient out-DMA replaced by a no-op), so the
rasterizer silently returned all-zero pair gradients.  Every gradient
conformance test lived in the slow tier, so the fast tier — what actually
runs before a commit — never noticed.

This file is deliberately NOT marked slow.  It runs a tiny scene through
the real `_bwd_kernel` in interpret mode and asserts the gradients both
(a) are nonzero and (b) match the reference oracle.  If a backward
ablation ever leaks into the tree again, `pytest -m "not slow"` fails in
seconds.

Contract under test: gradients of the differentiable rasterization,
reference `renderer/gaussian_renderer/__init__.py:94-102` (the
means2D/opacity/SH/scale/rotation grads the reference's CUDA backward
produces for the training loop).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_mesh_splatting_tpu.ops.rasterize_pallas import (
    TILE_H,
    TILE_W,
    rasterize_pallas,
)
from gaussian_mesh_splatting_tpu.ops.rasterize_reference import rasterize_reference

from helpers import random_scene, test_camera

BG = jnp.array([0.05, 0.1, 0.15])


def test_pallas_backward_emits_real_gradients():
    """Tiny grad-vs-oracle check: nonzero AND numerically correct."""
    n = 24
    scene_raw = random_scene(jax.random.key(11), n=n)
    cam = test_camera(width=128, height=16)
    target = jnp.full((16, 128, 3), 0.25)

    def make_loss(raster):
        def loss_fn(params, offset):
            out = raster(
                params["xyz"],
                jnp.exp(params["scales_log"]),
                params["rotations"],
                jax.nn.sigmoid(params["opacity_raw"]),
                cam,
                bg=BG,
                shs=params["shs"],
                sh_degree=1,
                mean2d_offset=offset,
            )
            return jnp.mean(jnp.abs(out.image - target)) + 0.1 * jnp.mean(out.alpha)

        return loss_fn

    offset = jnp.zeros((n, 2))
    loss_ref = make_loss(
        functools.partial(rasterize_reference, tile_size=(TILE_H, TILE_W))
    )
    loss_pal = make_loss(functools.partial(rasterize_pallas, interpret=True))

    g_ref, go_ref = jax.grad(loss_ref, argnums=(0, 1))(scene_raw, offset)
    g_pal, go_pal = jax.grad(loss_pal, argnums=(0, 1))(scene_raw, offset)

    # (a) the tripwire itself: an ablated backward returns exact zeros
    total_norm = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(g_pal)
    ) + float(jnp.sum(jnp.abs(go_pal)))
    assert total_norm > 1e-6, (
        "Pallas rasterizer backward produced (near-)zero gradients - a "
        "backward ablation/probe is likely committed in _bwd_kernel "
        "(this exact bug shipped in rounds 3 and 4)."
    )

    # (b) correctness vs the oracle on the same tiny scene. The DEFAULT
    # path stores bf16 split attributes AND packs gradient sort payloads
    # as bf16 (measured <= 4e-2 relative error vs the oracle, dominated
    # by the hi/lo mean2d split at global pixel coordinates) — 8e-2 is
    # looser than that but still catches any real backward defect; the
    # exact-path 5e-4 conformance lives in the slow tier
    # (test_raster_pallas.py) with grad/attr_precision="f32".
    for name in g_ref:
        a, b = np.asarray(g_ref[name]), np.asarray(g_pal[name])
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(
            b, a, atol=8e-2 * scale + 1e-7, err_msg=f"grad mismatch: {name}"
        )
        assert np.abs(a).max() > 0, f"oracle grad identically zero for {name}?"
    a, b = np.asarray(go_ref), np.asarray(go_pal)
    np.testing.assert_allclose(b, a, atol=8e-2 * max(np.abs(a).max(), 1e-8) + 1e-7)
