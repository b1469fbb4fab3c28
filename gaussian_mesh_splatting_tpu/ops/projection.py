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

TPU layout note: everything is computed COLUMNAR — per-coordinate (N,)
arrays rather than (N, 3)/(N, 3, 3) tensors. Small trailing dims put 3-4
useful lanes in 128-lane vregs (~128x waste per op); as (N,) expressions
the whole preprocess is a few dozen full-width VPU ops. Inputs/outputs
keep the reference's row-major (N, k) contract; the transposes in/out are
single cheap relayouts.

Binning rectangles are PER-AXIS (radius_x, radius_y): the axis-aligned
extent of the {alpha >= 1/255} ellipse is sqrt(2 ln(255 op) * cov_aa) per
axis, so "tight" mode bins each Gaussian into exactly the tiles where it
can contribute — bit-identical images to the CUDA 3-sigma-circle rects
(mode "cuda"), fewer pairs. All functions are batched and differentiable.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..core.sh import C0, C1, C2, C3, C4
from ..core.transforms import quat_to_rotmat

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
    radius_x: jax.Array | None = None  # (N,) binning rect x half-extent
    radius_y: jax.Array | None = None  # (N,) binning rect y half-extent


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
    """EWA 2D covariance (row-major API; see `_ewa_cov2d_cols` for the hot
    columnar path).

    Args:
      p_view: (N, 3) view-space positions.
      cov3d: (N, 3, 3) world-space covariances.
    Returns:
      (cov2d (N,3) [a,b,c] with dilation applied, det_ratio (N,) =
       det(cov2d_raw)/det(cov2d_dilated) for antialiasing compensation).
    """
    c3 = (
        cov3d[..., 0, 0], cov3d[..., 0, 1], cov3d[..., 0, 2],
        cov3d[..., 1, 1], cov3d[..., 1, 2], cov3d[..., 2, 2],
    )
    a, b, c, det_ratio = _ewa_cov2d_cols(
        (p_view[..., 0], p_view[..., 1], p_view[..., 2]), c3, cam
    )
    return jnp.stack([a, b, c], axis=-1), det_ratio


def _ewa_cov2d_cols(pv, cov6, cam: Camera):
    """Columnar EWA: pv = (tx, ty, tz) (N,) each; cov6 = the 6 unique 3D
    covariance entries (c00, c01, c02, c11, c12, c22). Returns columnar
    (a_dilated, b, c_dilated, det_ratio)."""
    fx, fy = cam.focal_x, cam.focal_y
    tx, ty, tz = pv
    tz = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    limx = 1.3 * cam.tanfovx
    limy = 1.3 * cam.tanfovy
    tx = jnp.clip(tx / tz, -limx, limx) * tz
    ty = jnp.clip(ty / tz, -limy, limy) * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J rows (2x3) for pixel coords wrt view coords, columnar
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2
    Wv = cam.world_view[:3, :3]  # world->view rotation (static per camera)
    # T = J @ Wv: t0k = j00*Wv[0,k] + j02*Wv[2,k]; t1k = j11*Wv[1,k] + j12*Wv[2,k]
    t0 = [j00 * Wv[0, k] + j02 * Wv[2, k] for k in range(3)]
    t1 = [j11 * Wv[1, k] + j12 * Wv[2, k] for k in range(3)]

    c00, c01, c02, c11, c12, c22 = cov6

    def quad(u, v):
        # u^T Sigma v with symmetric Sigma in 6-entry form
        return (
            u[0] * v[0] * c00
            + (u[0] * v[1] + u[1] * v[0]) * c01
            + (u[0] * v[2] + u[2] * v[0]) * c02
            + u[1] * v[1] * c11
            + (u[1] * v[2] + u[2] * v[1]) * c12
            + u[2] * v[2] * c22
        )

    a = quad(t0, t0)
    b = quad(t0, t1)
    c = quad(t1, t1)
    det_raw = a * c - b * b
    a_d = a + DILATION
    c_d = c + DILATION
    det_d = a_d * c_d - b * b
    det_ratio = det_raw / jnp.where(det_d == 0, 1.0, det_d)
    return a_d, b, c_d, det_ratio


def _eval_sh_cols(deg: int, sh_t: jax.Array, x, y, z):
    """Columnar SH evaluation: sh_t (K, C, N) transposed coefficients,
    x/y/z (N,) unit direction components. Returns C-list of (N,) values.

    Same basis/constants as core.sh.eval_sh (the row-major reference API);
    unrolled as full-width (N,) fmas so the VPU sees no 3- or 16-lane ops.
    """
    basis = [jnp.ones_like(x) * C0]
    if deg > 0:
        basis += [-C1 * y, C1 * z, -C1 * x]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            basis += [
                C2[0] * xy, C2[1] * yz, C2[2] * (2.0 * zz - xx - yy),
                C2[3] * xz, C2[4] * (xx - yy),
            ]
            if deg > 2:
                basis += [
                    C3[0] * y * (3 * xx - yy),
                    C3[1] * xy * z,
                    C3[2] * y * (4 * zz - xx - yy),
                    C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                    C3[4] * x * (4 * zz - xx - yy),
                    C3[5] * z * (xx - yy),
                    C3[6] * x * (xx - 3 * yy),
                ]
                if deg > 3:
                    basis += [
                        C4[0] * xy * (xx - yy),
                        C4[1] * yz * (3 * xx - yy),
                        C4[2] * xy * (7 * zz - 1),
                        C4[3] * yz * (7 * zz - 3),
                        C4[4] * (zz * (35 * zz - 30) + 3),
                        C4[5] * xz * (7 * zz - 3),
                        C4[6] * (xx - yy) * (7 * zz - 1),
                        C4[7] * xz * (xx - 3 * yy),
                        C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
                    ]
    n_ch = sh_t.shape[1]
    out = []
    for ch in range(n_ch):
        acc = basis[0] * sh_t[0, ch]
        for k in range(1, len(basis)):
            acc = acc + basis[k] * sh_t[k, ch]
        out.append(acc)
    return out


def sh_colors(
    sh_deg: int, shs: jax.Array, means3d: jax.Array, campos: jax.Array
) -> jax.Array:
    """Per-Gaussian RGB from SH and viewing direction, clamped at 0
    (matches the python SH path renderer/gaussian_renderer/__init__.py:82-87
    and the CUDA computeColorFromSH)."""
    dx = means3d[..., 0] - campos[0]
    dy = means3d[..., 1] - campos[1]
    dz = means3d[..., 2] - campos[2]
    inv_n = 1.0 / (jnp.sqrt(dx * dx + dy * dy + dz * dz) + 1e-12)
    coeff = (sh_deg + 1) ** 2
    sh_t = jnp.transpose(shs[..., :coeff], (2, 1, 0))  # (K, C, N)
    rgb = _eval_sh_cols(sh_deg, sh_t, dx * inv_n, dy * inv_n, dz * inv_n)
    return jnp.maximum(jnp.stack(rgb, axis=-1) + 0.5, 0.0)


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

    radius_mode selects the binning rectangle (NOT the reported radius,
    which is always the CUDA ceil(3 sigma_max) visibility radius):
      * "cuda": rx = ry = ceil(3 sigma_max) — the CUDA getRect square.
      * "tight": per-axis ceil(min(3 sigma_max, sqrt(2 ln(255 op) cov_aa)))
        — the exact axis extents of the {alpha >= 1/255} ellipse, clipped
        to the CUDA circle. Bins strictly fewer tiles with BIT-IDENTICAL
        compositing output (pairs outside it satisfy alpha < 1/255 at every
        pixel of their tile, which the compositor skips anyway).
    """
    # ---- columnar unpack (one relayout each) -----------------------------
    mT = means3d.T  # (3, N)
    mx3, my3, mz3 = mT[0], mT[1], mT[2]

    def apply_row(M, i):
        return M[i, 0] * mx3 + M[i, 1] * my3 + M[i, 2] * mz3 + M[i, 3]

    Wv = cam.world_view
    FP = cam.full_proj
    tx_v = apply_row(Wv, 0)
    ty_v = apply_row(Wv, 1)
    depth = apply_row(Wv, 2)
    inv_w = 1.0 / (apply_row(FP, 3) + 1e-7)
    px = ndc_to_pixel(apply_row(FP, 0) * inv_w, cam.width)
    py = ndc_to_pixel(apply_row(FP, 1) * inv_w, cam.height)
    if mean2d_offset is not None:
        oT = mean2d_offset.T
        px = px + oT[0]
        py = py + oT[1]

    # ---- 3D covariance (6 unique entries, columnar) ----------------------
    if cov3d_precomp is not None:
        c6 = cov3d_precomp.T  # (6, N): [c00, c01, c02, c11, c12, c22]
        cov6 = (c6[0], c6[1], c6[2], c6[3], c6[4], c6[5])
    else:
        qT = rotations.T
        qr, qx, qy, qz = qT[0], qT[1], qT[2], qT[3]
        inv_qn = 1.0 / jnp.sqrt(qr * qr + qx * qx + qy * qy + qz * qz)
        qr, qx, qy, qz = qr * inv_qn, qx * inv_qn, qy * inv_qn, qz * inv_qn
        r00 = 1 - 2 * (qy * qy + qz * qz)
        r01 = 2 * (qx * qy - qr * qz)
        r02 = 2 * (qx * qz + qr * qy)
        r10 = 2 * (qx * qy + qr * qz)
        r11 = 1 - 2 * (qx * qx + qz * qz)
        r12 = 2 * (qy * qz - qr * qx)
        r20 = 2 * (qx * qz - qr * qy)
        r21 = 2 * (qy * qz + qr * qx)
        r22 = 1 - 2 * (qx * qx + qy * qy)
        sT = scales.T
        s0, s1, s2 = sT[0] * scale_modifier, sT[1] * scale_modifier, sT[2] * scale_modifier
        s0q, s1q, s2q = s0 * s0, s1 * s1, s2 * s2

        def sig(ra, rb):
            return ra[0] * rb[0] * s0q + ra[1] * rb[1] * s1q + ra[2] * rb[2] * s2q

        R0 = (r00, r01, r02)
        R1 = (r10, r11, r12)
        R2 = (r20, r21, r22)
        cov6 = (sig(R0, R0), sig(R0, R1), sig(R0, R2),
                sig(R1, R1), sig(R1, R2), sig(R2, R2))

    a, b, c, det_ratio = _ewa_cov2d_cols((tx_v, ty_v, depth), cov6, cam)

    det = a * c - b * b
    det_ok = det > 0.0
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    conic_a = c * inv_det
    conic_b = -b * inv_det
    conic_c = a * inv_det

    opac = opacities.reshape(-1)
    if antialiasing:
        opac = opac * jnp.sqrt(jnp.maximum(det_ratio, 0.0))

    # conservative screen radius from the major eigenvalue (CUDA heuristic)
    mid = 0.5 * (a + c)
    disc = jnp.maximum(mid * mid - det, 0.1)
    sigma_max = jnp.sqrt(jnp.maximum(mid + jnp.sqrt(disc), 0.0))
    radius = jnp.ceil(3.0 * sigma_max)

    if radius_mode == "cuda":
        rx = ry = radius
    elif radius_mode == "tight":
        # alpha >= 1/255 along axis e_a extends sqrt(2 ln(255 op) cov_aa)
        # pixels from the mean; clip to the CUDA 3-sigma circle so the pair
        # set is a subset of "cuda" mode's. Opacity <= 1/255 -> empty rect.
        # +1 px guard: tile_rect's CUDA-parity exclusive bound
        # floor((m + r + t - 1)/t) can stop one pixel short of m + r when
        # m + r lands in the first (1/t)-th of a tile — the slack of the
        # 3-sigma radius absorbs that, an exact radius must not.
        lim = 2.0 * jnp.log(jnp.maximum(255.0 * opac, 1e-12))
        lim = jnp.maximum(lim, 0.0)
        rx = jnp.ceil(jnp.minimum(jnp.sqrt(lim * jnp.maximum(a, 0.0)), 3.0 * sigma_max)) + 1.0
        ry = jnp.ceil(jnp.minimum(jnp.sqrt(lim * jnp.maximum(c, 0.0)), 3.0 * sigma_max)) + 1.0
        visible = opac * 255.0 > 1.0
        rx = jnp.where(visible, rx, 0.0)
        ry = jnp.where(visible, ry, 0.0)
    else:
        raise ValueError(f"unknown radius_mode {radius_mode!r}")

    if colors is None:
        assert shs is not None
        color = sh_colors(sh_degree, shs, means3d, cam.cam_center)
    else:
        color = colors

    valid = (depth > NEAR_CULL_Z) & det_ok
    if alive is not None:
        valid = valid & alive
    radius = jnp.where(valid, radius, 0.0)
    rx = jnp.where(valid, rx, 0.0)
    ry = jnp.where(valid, ry, 0.0)
    return ProjectedGaussians(
        mean2d=jnp.stack([px, py], axis=-1),
        depth=depth,
        conic=jnp.stack([conic_a, conic_b, conic_c], axis=-1),
        opacity=opac,
        color=color,
        radius=radius,
        valid=valid,
        radius_x=rx,
        radius_y=ry,
    )
