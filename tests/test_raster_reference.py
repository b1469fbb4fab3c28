import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_mesh_splatting_tpu.ops.projection import preprocess
from gaussian_mesh_splatting_tpu.ops.rasterize_reference import rasterize_reference

from helpers import activated, random_scene, test_camera

BG_BLACK = jnp.zeros(3)
BG_WHITE = jnp.ones(3)


def _single_gaussian(color=(1.0, 0.0, 0.0), opacity=0.8, scale=0.1, z_world=0.0):
    from gaussian_mesh_splatting_tpu.core.sh import rgb_to_sh

    means3d = jnp.array([[0.0, 0.0, z_world]])
    scales = jnp.full((1, 3), scale)
    rots = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    opac = jnp.array([[opacity]])
    shs = jnp.zeros((1, 3, 16)).at[0, :, 0].set(rgb_to_sh(jnp.array(color)))
    return means3d, scales, rots, opac, shs


def test_empty_scene_renders_background():
    cam = test_camera()
    m, s, r, o, sh = _single_gaussian(opacity=0.0)
    out = rasterize_reference(m, s, r, jnp.zeros((1, 1)), cam, bg=BG_WHITE, shs=sh, sh_degree=0)
    np.testing.assert_allclose(np.asarray(out.image), 1.0, atol=1e-5)


def test_single_gaussian_center_alpha_closed_form():
    cam = test_camera(width=64, height=64)
    opacity = 0.8
    m, s, r, o, sh = _single_gaussian(color=(1.0, 0.0, 0.0), opacity=opacity)
    out = rasterize_reference(m, s, r, o, cam, bg=BG_BLACK, shs=sh, sh_degree=0)
    img = np.asarray(out.image)
    # projected center is at pixel ((w-1)/2, (h-1)/2) = 31.5 -> peak spread
    # over the 4 center pixels; at a half-pixel offset alpha ~= opacity *
    # exp(-0.5 * conic * 0.5) — just check the red channel dominates and the
    # peak is close to opacity
    cy, cx = 31, 31
    peak = img[cy : cy + 2, cx : cx + 2, 0].max()
    assert abs(peak - opacity) < 0.05, peak
    assert img[..., 1].max() < 1e-4 and img[..., 2].max() < 1e-4
    # alpha map matches red channel for a red-on-black single-gaussian render
    np.testing.assert_allclose(np.asarray(out.alpha), img[..., 0], atol=1e-5)


def test_two_gaussians_depth_order_compositing():
    """Closed-form front-to-back: red at z=0 (near), green at z=1 (far)."""
    from gaussian_mesh_splatting_tpu.core.sh import rgb_to_sh

    cam = test_camera(dist=4.0)
    means3d = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    scales = jnp.full((2, 3), 0.3)
    rots = jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (2, 1))
    opac = jnp.array([[0.6], [0.7]])
    shs = jnp.zeros((2, 3, 16))
    shs = shs.at[0, :, 0].set(rgb_to_sh(jnp.array([1.0, 0.0, 0.0])))
    shs = shs.at[1, :, 0].set(rgb_to_sh(jnp.array([0.0, 1.0, 0.0])))
    out = rasterize_reference(means3d, scales, rots, opac, cam, bg=BG_BLACK, shs=shs, sh_degree=0)
    img = np.asarray(out.image)
    cy = cx = 31
    patch = img[cy : cy + 2, cx : cx + 2]
    # near red contributes ~alpha_r, far green ~(1-alpha_r)*alpha_g => red > green
    assert patch[..., 0].max() > patch[..., 1].max() > 0.05
    # swap depths -> green dominates
    means3d2 = means3d.at[:, 2].set(jnp.array([1.0, 0.0]))
    out2 = rasterize_reference(means3d2, scales, rots, opac, cam, bg=BG_BLACK, shs=shs, sh_degree=0)
    img2 = np.asarray(out2.image)
    patch2 = img2[cy : cy + 2, cx : cx + 2]
    assert patch2[..., 1].max() > patch2[..., 0].max()


def test_behind_camera_culled():
    cam = test_camera(dist=4.0)
    m, s, r, o, sh = _single_gaussian(z_world=-10.0)  # behind the camera
    out = rasterize_reference(m, s, r, o, cam, bg=BG_BLACK, shs=sh, sh_degree=0)
    assert int(out.radii[0]) == 0
    np.testing.assert_allclose(np.asarray(out.image), 0.0, atol=1e-6)


def test_opaque_front_occludes():
    from gaussian_mesh_splatting_tpu.core.sh import rgb_to_sh

    cam = test_camera()
    means3d = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    scales = jnp.full((2, 3), 0.5)
    rots = jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (2, 1))
    opac = jnp.array([[0.999], [0.9]])
    shs = jnp.zeros((2, 3, 16))
    shs = shs.at[0, :, 0].set(rgb_to_sh(jnp.array([1.0, 0.0, 0.0])))
    shs = shs.at[1, :, 0].set(rgb_to_sh(jnp.array([0.0, 1.0, 0.0])))
    out = rasterize_reference(means3d, scales, rots, opac, cam, bg=BG_BLACK, shs=shs, sh_degree=0)
    img = np.asarray(out.image)
    # alpha is clamped at 0.99: residual green <= (1-0.99)*0.9
    assert img[31, 31, 1] < 0.02


def test_random_scene_finite_and_bounded():
    scene = activated(random_scene(jax.random.key(0), n=128))
    cam = test_camera(width=48, height=40)
    out = rasterize_reference(
        scene["means3d"], scene["scales"], scene["rotations"], scene["opacities"],
        cam, bg=BG_WHITE, shs=scene["shs"], sh_degree=3,
    )
    img = np.asarray(out.image)
    assert np.all(np.isfinite(img))
    assert img.min() >= -1e-5
    a = np.asarray(out.alpha)
    assert a.min() >= -1e-6 and a.max() <= 1.0 + 1e-6


def test_gradients_finite_and_flow_to_all_params():
    scene = random_scene(jax.random.key(1), n=32)
    cam = test_camera(width=32, height=32)
    target = jnp.zeros((32, 32, 3))

    def loss_fn(params, mean2d_offset):
        out = rasterize_reference(
            params["xyz"],
            jnp.exp(params["scales_log"]),
            params["rotations"],
            jax.nn.sigmoid(params["opacity_raw"]),
            cam,
            bg=BG_BLACK,
            shs=params["shs"],
            sh_degree=2,
            mean2d_offset=mean2d_offset,
        )
        return jnp.mean(jnp.abs(out.image - target))

    offset = jnp.zeros((32, 2))
    grads, g_off = jax.grad(loss_fn, argnums=(0, 1))(scene, offset)
    for name, g in grads.items():
        arr = np.asarray(g)
        assert np.all(np.isfinite(arr)), name
        assert np.abs(arr).max() > 0, f"no gradient signal for {name}"
    g_off = np.asarray(g_off)
    assert np.all(np.isfinite(g_off)) and np.abs(g_off).max() > 0


def test_gradient_matches_finite_difference():
    """Pixel-gradient correctness: autodiff vs central finite differences,
    in float64 so the comparison is not dominated by f32 cancellation.
    (Small residual mismatch is expected where a perturbation crosses the
    rasterizer's hard thresholds — alpha cutoff, tile binning — so we use a
    directional derivative and a modest tolerance.)"""
    with jax.enable_x64(True):
        scene = {k: jnp.asarray(np.asarray(v), jnp.float64)
                 for k, v in random_scene(jax.random.key(2), n=8).items()}
        cam32 = test_camera(width=24, height=24)
        cam = jax.tree.map(lambda x: jnp.asarray(np.asarray(x), jnp.float64), cam32)

        def loss_fn(xyz):
            out = rasterize_reference(
                xyz,
                jnp.exp(scene["scales_log"]),
                scene["rotations"],
                jax.nn.sigmoid(scene["opacity_raw"]),
                cam,
                bg=jnp.ones(3, jnp.float64),
                shs=scene["shs"],
                sh_degree=0,
            )
            return jnp.sum(out.image**2)

        xyz = scene["xyz"]
        g = jax.grad(loss_fn)(xyz)
        for seed in range(3):
            d = jax.random.normal(jax.random.key(10 + seed), xyz.shape, jnp.float64)
            d = d / jnp.linalg.norm(d) * 1e-5
            fd = (loss_fn(xyz + d) - loss_fn(xyz - d)) / 2.0
            analytic = jnp.sum(g * d)
            np.testing.assert_allclose(float(analytic), float(fd), rtol=1e-4, atol=1e-12)


def test_antialiasing_reduces_small_gaussian_opacity():
    cam = test_camera()
    m, s, r, o, sh = _single_gaussian(opacity=0.9, scale=0.002)  # sub-pixel
    out_plain = rasterize_reference(m, s, r, o, cam, bg=BG_BLACK, shs=sh, sh_degree=0)
    out_aa = rasterize_reference(
        m, s, r, o, cam, bg=BG_BLACK, shs=sh, sh_degree=0, antialiasing=True
    )
    assert np.asarray(out_aa.image).max() < np.asarray(out_plain.image).max()


def test_preprocess_radius_scales_with_size():
    cam = test_camera()
    m, s, r, o, sh = _single_gaussian(scale=0.05)
    big = preprocess(m, s * 4, r, o, cam, shs=sh, sh_degree=0)
    small = preprocess(m, s, r, o, cam, shs=sh, sh_degree=0)
    assert float(big.radius[0]) > float(small.radius[0]) > 0
