"""Per-Gaussian screen-space preprocessing, shared by the oracle and Pallas
rasterizers.

Implements the EWA-splatting preprocessing contract of the reference CUDA
rasterizer (`diff_gaussian_rasterization`, consumed at
renderer/gaussian_renderer/__init__.py:43-102):

  * frustum cull at view-space depth <= 0.2;
  * project means with the camera's full projective transform, w-divide with
    a 1e-7 guard, NDC -> pixel with the half-pixel-centered map
    ``pix = ((ndc + 1) * size - 1) / 2``;
  * 3D covariance from quaternion + log-scale (Sigma = R S S^T R^T);
  * 2D covariance by the local-affine (Jacobian) EWA approximation with the
    view-space x/y clamped to 1.3x the frustum tangents;
  * +0.3 px isotropic dilation of the 2D covariance (the CUDA low-pass
    filter), with the optional antialiasing convolution-scale factor applied
    to opacity when enabled;
  * conic (inverse 2D covariance), radius = ceil(3 sqrt(max eigenvalue)).

All functions are batched over Gaussians and differentiable.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..core.sh import eval_sh
from ..core.transforms import quat_to_rotmat, unstrip_symmetric

NEAR_CULL_Z = 0.2  # matches the CUDA in_frustum near clip
DILATION = 0.3  # px^2 added to the 2D covariance diagonal


class ProjectedGaussians(NamedTuple):
    """Screen-space Gaussian attributes, one row per input Gaussian."""

    mean2d: jax.Array  # (N, 2) pixel coordinates
    depth: jax.Array  # (N,) view-space z
    conic: jax.Array  # (N, 3) inverse 2D covariance (a, b, c): [[a,b],[b,c]]
    opacity: jax.Array  # (N,) opacity, incl. antialiasing compensation
    color: jax.Array  # (N, 3) RGB from SH (or passthrough colors)
    radius: jax.Array  # (N,) float conservative pixel radius (0 if culled)
    valid: jax.Array  # (N,) bool: survives culling and has positive det


def compute_cov3d(scaling: jax.Array, rotation_q: jax.Array, modifier=1.0) -> jax.Array:
    """(N,3) activated scales + (N,4) quats -> (N,3,3) covariance."""
    R = quat_to_rotmat(rotation_q)
    L = R * (modifier * scaling)[..., None, :]
    return L @ jnp.swapaxes(L, -1, -2)


def ndc_to_pixel(ndc: jax.Array, size) -> jax.Array:
    """CUDA ndc2Pix: ((v + 1) * size - 1) * 0.5 (pixel centers at integers)."""
    return ((ndc + 1.0) * size - 1.0) * 0.5


def project_points(means3d: jax.Array, cam: Camera) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Project (N,3) world points.

    Returns (mean2d_pixels (N,2), view_z (N,), p_view (N,3))."""
    ones = jnp.ones((*means3d.shape[:-1], 1), means3d.dtype)
    hom = jnp.concatenate([means3d, ones], axis=-1)
    p_view = hom @ cam.world_view.T  # (N, 4)
    clip = hom @ cam.full_proj.T  # (N, 4)
    w = clip[..., 3:4] + 1e-7
    ndc = clip[..., :3] / w
    px = ndc_to_pixel(ndc[..., 0], cam.width)
    py = ndc_to_pixel(ndc[..., 1], cam.height)
    return jnp.stack([px, py], axis=-1), p_view[..., 2], p_view[..., :3]


def ewa_cov2d(
    p_view: jax.Array, cov3d: jax.Array, cam: Camera
) -> tuple[jax.Array, jax.Array]:
    """EWA 2D covariance.

    Args:
      p_view: (N, 3) view-space positions.
      cov3d: (N, 3, 3) world-space covariances.
    Returns:
      (cov2d (N,3) [a,b,c] with dilation applied, det_ratio (N,) =
       det(cov2d_raw)/det(cov2d_dilated) for antialiasing compensation).
    """
    fx, fy = cam.focal_x, cam.focal_y
    tx, ty, tz = p_view[..., 0], p_view[..., 1], p_view[..., 2]
    tz = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    limx = 1.3 * cam.tanfovx
    limy = 1.3 * cam.tanfovy
    txtz = jnp.clip(tx / tz, -limx, limx)
    tytz = jnp.clip(ty / tz, -limy, limy)
    tx = txtz * tz
    ty = tytz * tz

    # J rows for x,y pixel coords wrt view coords
    z2 = tz * tz
    J = jnp.stack(
        [
            jnp.stack([fx / tz, jnp.zeros_like(tz), -fx * tx / z2], axis=-1),
            jnp.stack([jnp.zeros_like(tz), fy / tz, -fy * ty / z2], axis=-1),
        ],
        axis=-2,
    )  # (N, 2, 3)
    Wv = cam.world_view[:3, :3]  # world->view rotation
    T = J @ Wv  # (N, 2, 3)
    cov2 = T @ cov3d @ jnp.swapaxes(T, -1, -2)  # (N, 2, 2)
    a = cov2[..., 0, 0]
    b = cov2[..., 0, 1]
    c = cov2[..., 1, 1]
    det_raw = a * c - b * b
    a_d = a + DILATION
    c_d = c + DILATION
    det_d = a_d * c_d - b * b
    det_ratio = det_raw / jnp.where(det_d == 0, 1.0, det_d)
    return jnp.stack([a_d, b, c_d], axis=-1), det_ratio


def sh_colors(
    sh_deg: int, shs: jax.Array, means3d: jax.Array, campos: jax.Array
) -> jax.Array:
    """Per-Gaussian RGB from SH and viewing direction, clamped at 0
    (matches the python SH path renderer/gaussian_renderer/__init__.py:82-87
    and the CUDA computeColorFromSH)."""
    dirs = means3d - campos
    dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
    rgb = eval_sh(sh_deg, shs, dirs)
    return jnp.maximum(rgb + 0.5, 0.0)


def preprocess(
    means3d: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    opacities: jax.Array,
    cam: Camera,
    *,
    shs: jax.Array | None = None,
    colors: jax.Array | None = None,
    sh_degree: int = 0,
    scale_modifier=1.0,
    cov3d_precomp: jax.Array | None = None,
    antialiasing: bool = False,
    mean2d_offset: jax.Array | None = None,
    alive: jax.Array | None = None,
    radius_mode: str = "cuda",
) -> ProjectedGaussians:
    """Full screen-space preprocessing for a batch of Gaussians.

    `mean2d_offset` is an all-zeros (N, 2) tensor the caller threads in to
    obtain screen-space positional gradients (the functional replacement for
    the reference's `screenspace_points` grad side-channel,
    renderer/gaussian_renderer/__init__.py:32-37): gradients w.r.t. it equal
    gradients w.r.t. the projected pixel positions.
    """
    mean2d, depth, p_view = project_points(means3d, cam)
    if mean2d_offset is not None:
        mean2d = mean2d + mean2d_offset

    if cov3d_precomp is not None:
        cov3d = unstrip_symmetric(cov3d_precomp)
    else:
        cov3d = compute_cov3d(scales, rotations, scale_modifier)
    cov2d, det_ratio = ewa_cov2d(p_view, cov3d, cam)

    a, b, c = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = a * c - b * b
    det_ok = det > 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    opac = opacities.reshape(-1)
    if antialiasing:
        opac = opac * jnp.sqrt(jnp.maximum(det_ratio, 0.0))

    # conservative screen radius from the major eigenvalue
    mid = 0.5 * (a + c)
    disc = jnp.maximum(mid * mid - det, 0.1)
    lambda1 = mid + jnp.sqrt(disc)
    sigma_max = jnp.sqrt(jnp.maximum(lambda1, 0.0))
    if radius_mode == "cuda":
        # fixed 3-sigma bound (the CUDA rasterizer's heuristic)
        n_sigma = 3.0
    elif radius_mode == "tight":
        # opacity-aware bound: alpha >= 1/255 <=> power >= ln(1/(255 op)),
        # i.e. distance <= sqrt(2 ln(255 op)) sigma. Never looser than 3
        # sigma; low-opacity Gaussians (e.g. after opacity reset) bin into
        # far fewer tiles. Exact w.r.t. the compositing cutoff.
        n_sigma = jnp.sqrt(2.0 * jnp.log(jnp.maximum(255.0 * opac, 1.0 + 1e-6)))
        n_sigma = jnp.minimum(n_sigma, 3.0)
    else:
        raise ValueError(f"unknown radius_mode {radius_mode!r}")
    radius = jnp.ceil(n_sigma * sigma_max)

    if colors is None:
        assert shs is not None
        color = sh_colors(sh_degree, shs, means3d, cam.cam_center)
    else:
        color = colors

    valid = (depth > NEAR_CULL_Z) & det_ok
    if alive is not None:
        valid = valid & alive
    radius = jnp.where(valid, radius, 0.0)
    return ProjectedGaussians(
        mean2d=mean2d,
        depth=depth,
        conic=conic,
        opacity=opac,
        color=color,
        radius=radius,
        valid=valid,
    )
