import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_mesh_splatting_tpu.models import flat, mesh, vanilla
from gaussian_mesh_splatting_tpu.ops.ssim import ssim
from gaussian_mesh_splatting_tpu.renderer import render
from gaussian_mesh_splatting_tpu.train import (
    make_train_state,
    make_train_step,
    one_up_sh_degree,
    optimization_config,
    photometric_loss,
    psnr,
)

from helpers import test_camera
from test_models import _icosahedron


def _cameras_around(n=6, width=40, height=40, dist=4.0):
    from gaussian_mesh_splatting_tpu.core import make_camera

    cams = []
    for i in range(n):
        angle = 2 * np.pi * i / n
        # camera orbiting the origin in the xz plane, looking at the origin
        c = np.array([dist * np.sin(angle), 0.0, -dist * np.cos(angle)])
        fwd = -c / np.linalg.norm(c)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        true_up = np.cross(fwd, right)
        Rc2w = np.stack([right, true_up, fwd], axis=1)
        T = -Rc2w.T @ c
        cams.append(make_camera(Rc2w, T, 0.9, 0.9, width, height))
    return cams


def _gt_scene(key, n=40):
    """A 'secret' scene whose renders are the ground truth."""
    k1, k2, k3 = jax.random.split(key, 3)
    pts = jax.random.normal(k1, (n, 3)) * 0.6
    cols = jax.random.uniform(k2, (n, 3))
    state = flat.init_from_points(pts, cols, sh_degree=0)
    state["params"]["scaling"] = jax.random.normal(k3, (n, 2)) * 0.2 - 1.6
    return state


# ---------------------------------------------------------------- ssim

def test_ssim_identical_is_one():
    img = jax.random.uniform(jax.random.key(0), (32, 32, 3))
    assert float(ssim(img, img)) > 0.999


def test_ssim_decreases_with_noise():
    img = jax.random.uniform(jax.random.key(1), (32, 32, 3))
    noisy = jnp.clip(img + jax.random.normal(jax.random.key(2), img.shape) * 0.2, 0, 1)
    s_clean = float(ssim(img, img))
    s_noisy = float(ssim(img, noisy))
    assert s_noisy < s_clean - 0.05


def test_ssim_matches_reference_window_normalization():
    # constant images => ssim exactly 1 regardless of padding
    a = jnp.full((24, 24, 3), 0.5)
    assert abs(float(ssim(a, a)) - 1.0) < 1e-6


# ---------------------------------------------------------------- training

@pytest.mark.slow  # multi-step optimization to convergence
def test_gs_flat_overfits_small_scene():
    """End-to-end slice: loader-free gs_flat training on oracle-rendered GT
    must overfit (PSNR clearly rising) — driver config #1 (BASELINE.md)."""
    gt_state = _gt_scene(jax.random.key(3))
    cams = _cameras_around(n=6)
    bg = jnp.zeros(3)
    gt_bag = flat.to_bag(gt_state)
    gts = [render(gt_bag, c, bg, sh_degree=0, backend="reference").image for c in cams]

    # init from noisy versions of the gt points
    pts = gt_state["params"]["xyz"] + jax.random.normal(jax.random.key(4), (40, 3)) * 0.05
    cols = jnp.full((40, 3), 0.5)
    state0 = flat.init_from_points(pts, cols, sh_degree=0)
    cfg = optimization_config("gs_flat")
    tstate, tx = make_train_state("gs_flat", state0, cfg, spatial_lr_scale=1.0)
    step = make_train_step(flat, tx, cfg, sh_degree_max=0, backend="reference")

    def epoch_psnr(ts):
        vals = []
        for c, g in zip(cams, gts):
            bag = flat.to_bag({"params": ts.params, "alive": ts.alive, "consts": {}})
            img = render(bag, c, bg, sh_degree=0, backend="reference").image
            vals.append(float(psnr(img, g)))
        return np.mean(vals)

    p0 = epoch_psnr(tstate)
    for it in range(120):
        i = it % len(cams)
        tstate, metrics = step(tstate, cams[i], gts[i], bg)
    p1 = epoch_psnr(tstate)
    assert np.isfinite(metrics["loss"])
    assert p1 > p0 + 3.0, (p0, p1)


@pytest.mark.slow  # multi-step optimization to convergence
def test_gs_mesh_overfits_and_moves_alpha():
    """gs_mesh training: loss falls, alpha/scale/features get updates,
    vertices stay frozen at vertices_lr=0 (arguments_games/__init__.py:20)."""
    verts, faces = _icosahedron()
    f = faces.shape[0]
    key = jax.random.key(5)
    alpha = jax.random.uniform(key, (f, 2, 3))
    colors = jax.random.uniform(jax.random.key(6), (f * 2, 3))
    gt_state = mesh.init_from_mesh(verts, faces, alpha, colors, sh_degree=0)
    # ground truth: slightly scaled-up mesh with different colors
    gt_bag = mesh.to_bag(gt_state)
    cams = _cameras_around(n=4, width=32, height=32, dist=3.0)
    bg = jnp.ones(3)
    gts = [render(gt_bag, c, bg, sh_degree=0, backend="reference").image for c in cams]

    # student: same mesh, random init colors/alpha
    alpha2 = jax.random.uniform(jax.random.key(7), (f, 2, 3))
    colors2 = jnp.full((f * 2, 3), 0.5)
    state0 = mesh.init_from_mesh(verts, faces, alpha2, colors2, sh_degree=0)
    cfg = optimization_config("gs_mesh")
    tstate, tx = make_train_state("gs_mesh", state0, cfg)
    step = make_train_step(mesh, tx, cfg, sh_degree_max=0, backend="reference")

    v_before = np.asarray(tstate.params["vertices"]).copy()
    a_before = np.asarray(tstate.params["alpha"]).copy()
    losses = []
    for it in range(60):
        i = it % len(cams)
        tstate, metrics = step(tstate, cams[i], gts[i], bg)
        losses.append(float(metrics["loss"]))
    assert np.mean(losses[-8:]) < np.mean(losses[:8]) * 0.8, losses[:3] + losses[-3:]
    np.testing.assert_allclose(np.asarray(tstate.params["vertices"]), v_before, atol=0)
    assert np.abs(np.asarray(tstate.params["alpha"]) - a_before).max() > 1e-5


def test_sh_degree_warmup():
    pts = jax.random.normal(jax.random.key(8), (10, 3))
    cols = jnp.full((10, 3), 0.5)
    state0 = vanilla.init_from_points(pts, cols, sh_degree=3)
    cfg = optimization_config("gs")
    tstate, tx = make_train_state("gs", state0, cfg)
    assert int(tstate.active_sh_degree) == 0
    for _ in range(5):
        tstate = one_up_sh_degree(tstate, 3)
    assert int(tstate.active_sh_degree) == 3


def test_densify_stats_accumulate():
    gt_state = _gt_scene(jax.random.key(9), n=16)
    cams = _cameras_around(n=2, width=24, height=24)
    bg = jnp.zeros(3)
    gt_bag = flat.to_bag(gt_state)
    gt = render(gt_bag, cams[0], bg, sh_degree=0, backend="reference").image

    pts = gt_state["params"]["xyz"]
    state0 = flat.init_from_points(pts + 0.1, jnp.full((16, 3), 0.3), sh_degree=0)
    cfg = optimization_config("gs_flat")
    tstate, tx = make_train_state("gs_flat", state0, cfg)
    step = make_train_step(flat, tx, cfg, sh_degree_max=0, backend="reference")
    tstate, _ = step(tstate, cams[0], gt, bg)
    assert float(jnp.sum(tstate.stats.denom)) > 0
    assert float(jnp.sum(tstate.stats.grad_accum)) > 0
    assert float(jnp.max(tstate.stats.max_radii)) > 0


def test_blur_shifted_add_matches_band_matmul():
    """The shifted-add separable blur must agree with the banded-matmul
    oracle (same zero-padded 'same' conv) to float rounding."""
    from gaussian_mesh_splatting_tpu.ops.ssim import _blur, _blur_band

    img = jax.random.uniform(jax.random.key(7), (40, 56, 3))
    a = np.asarray(_blur(img, 11, 1.5))
    b = np.asarray(_blur_band(img, 11, 1.5))
    np.testing.assert_allclose(a, b, atol=2e-6)
