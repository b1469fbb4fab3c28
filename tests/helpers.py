"""Shared test fixtures: tiny procedural scenes + cameras."""
import jax
import jax.numpy as jnp
import numpy as np

from gaussian_mesh_splatting_tpu.core import make_camera
from gaussian_mesh_splatting_tpu.core.transforms import inverse_sigmoid


def test_camera(width=64, height=64, fov=0.8, dist=4.0):
    """Camera at (0,0,-dist) looking down +z toward the origin."""
    R = np.eye(3)
    T = np.array([0.0, 0.0, dist])
    return make_camera(R, T, fov, fov, width, height)


# a helper, not a test — stop pytest collecting it from importers' namespaces
test_camera.__test__ = False


def random_scene(key, n=64, spread=1.0, scale_log_mean=-2.5):
    """Random Gaussians near the origin; returns dict of raw (pre-activation)
    params in the reference layout."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    xyz = jax.random.normal(k1, (n, 3)) * spread * 0.5
    scales_log = jax.random.normal(k2, (n, 3)) * 0.3 + scale_log_mean
    q = jax.random.normal(k3, (n, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    opacity_raw = inverse_sigmoid(jnp.clip(jax.random.uniform(k4, (n, 1)), 0.05, 0.95))
    sh_dc = jax.random.uniform(k5, (n, 3, 1)) * 2.0 - 0.5
    sh_rest = jax.random.normal(k6, (n, 3, 15)) * 0.02
    shs = jnp.concatenate([sh_dc, sh_rest], axis=-1)
    return dict(
        xyz=xyz, scales_log=scales_log, rotations=q, opacity_raw=opacity_raw, shs=shs
    )


def activated(scene):
    return dict(
        means3d=scene["xyz"],
        scales=jnp.exp(scene["scales_log"]),
        rotations=scene["rotations"],
        opacities=jax.nn.sigmoid(scene["opacity_raw"]),
        shs=scene["shs"],
    )
