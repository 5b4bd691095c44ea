"""Gaussian projection: world space -> screen space (EWA splatting geometry).

TPU-native replacement for gsplat's ``fully_fused_projection`` CUDA kernel
(consumed by the reference at runner.py:341-362). Everything here is batched
XLA — quaternion->rotation, covariance composition and the projection
Jacobian are elementwise/small-matmul ops that XLA fuses; differentiable by
autodiff (no custom VJP needed at this stage — the custom-VJP boundary is the
tile compositor in ops/rasterize.py).

Supports pinhole / ortho / fisheye camera models (reference ``camera_model``
config field, config.py:90) and classic / antialiased modes (opacity
compensation as in gsplat's ``rasterize_mode="antialiased"``).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Projected(NamedTuple):
    """Per-(camera, gaussian) screen-space quantities; leading dims [C, N]."""

    means2d: jnp.ndarray  # [C, N, 2] pixel coords
    conics: jnp.ndarray  # [C, N, 3] inverse 2D covariance (a, b, c)
    depths: jnp.ndarray  # [C, N] camera-space z
    radii: jnp.ndarray  # [C, N] int32 screen radius (0 = culled)
    opacities: jnp.ndarray  # [C, N] (compensated when antialiased)


def quat_to_rotmat(quats: jnp.ndarray) -> jnp.ndarray:
    """Normalized quaternion (wxyz) -> rotation matrix. [..., 4] -> [..., 3, 3]."""
    q = quats / jnp.maximum(jnp.linalg.norm(quats, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z),
            2 * (x * y - w * z),
            2 * (x * z + w * y),
            2 * (x * y + w * z),
            1 - 2 * (x * x + z * z),
            2 * (y * z - w * x),
            2 * (x * z - w * y),
            2 * (y * z + w * x),
            1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def covariance_3d(quats: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """Sigma = R diag(s^2) R^T. quats [...,4], scales [...,3] -> [...,3,3]."""
    rot = quat_to_rotmat(quats)
    m = rot * scales[..., None, :]
    return m @ jnp.swapaxes(m, -1, -2)


def _persp_proj_jac(t, fx, fy, tan_fovx, tan_fovy):
    """Perspective projection Jacobian with frustum-clamped tx/tz, ty/tz."""
    tz = t[..., 2]
    inv_z = 1.0 / tz
    lim_x, lim_y = 1.3 * tan_fovx, 1.3 * tan_fovy
    txz = jnp.clip(t[..., 0] * inv_z, -lim_x, lim_x)
    tyz = jnp.clip(t[..., 1] * inv_z, -lim_y, lim_y)
    zeros = jnp.zeros_like(tz)
    j = jnp.stack(
        [
            fx * inv_z,
            zeros,
            -fx * txz * inv_z,
            zeros,
            fy * inv_z,
            -fy * tyz * inv_z,
        ],
        axis=-1,
    )
    return j.reshape(t.shape[:-1] + (2, 3))


def project_gaussians(
    means: jnp.ndarray,  # [N, 3]
    quats: jnp.ndarray,  # [N, 4]
    scales: jnp.ndarray,  # [N, 3] post-activation (positive)
    opacities: jnp.ndarray,  # [N] post-sigmoid
    viewmats: jnp.ndarray,  # [C, 4, 4] world->camera
    Ks: jnp.ndarray,  # [C, 3, 3]
    width: int,
    height: int,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    eps2d: float = 0.3,
    antialiased: bool = False,
    radius_clip: float = 0.0,
    camera_model: str = "pinhole",
    alive: jnp.ndarray | None = None,  # [N] bool capacity mask
) -> Projected:
    """Project gaussians into each camera. Fully batched over [C, N]."""
    t = jnp.einsum("cij,nj->cni", viewmats[:, :3, :3], means)
    t = t + viewmats[:, None, :3, 3]  # [C,N,3]
    tz = t[..., 2]

    fx, fy = Ks[:, None, 0, 0], Ks[:, None, 1, 1]
    cx, cy = Ks[:, None, 0, 2], Ks[:, None, 1, 2]

    cov3d = covariance_3d(quats, scales)  # [N,3,3]
    cov_cam = jnp.einsum("cij,njk,clk->cnil", viewmats[:, :3, :3], cov3d, viewmats[:, :3, :3])

    if camera_model == "pinhole":
        tan_fovx = 0.5 * width / fx
        tan_fovy = 0.5 * height / fy
        j = _persp_proj_jac(t, fx, fy, tan_fovx, tan_fovy)  # [C,N,2,3]
        inv_z = 1.0 / tz
        mean2d = jnp.stack(
            [fx * t[..., 0] * inv_z + cx, fy * t[..., 1] * inv_z + cy], axis=-1
        )
    elif camera_model == "ortho":
        zeros = jnp.zeros_like(tz)
        j = jnp.stack(
            [fx + zeros, zeros, zeros, zeros, fy + zeros, zeros], axis=-1
        ).reshape(t.shape[:-1] + (2, 3))
        mean2d = jnp.stack(
            [fx * t[..., 0] + cx, fy * t[..., 1] + cy], axis=-1
        )
    elif camera_model == "fisheye":
        # Equidistant fisheye: r_img = f * theta (gsplat's fisheye model).
        x, y = t[..., 0], t[..., 1]
        r2 = x * x + y * y
        r = jnp.sqrt(jnp.maximum(r2, 1e-12))
        theta = jnp.arctan2(r, tz)
        s_ = theta / r
        mean2d = jnp.stack([fx * x * s_ + cx, fy * y * s_ + cy], axis=-1)
        # Jacobian of (fx x θ/r, fy y θ/r) wrt (x, y, z).
        l2 = r2 + tz * tz
        dth_dx = tz * x / (l2 * r)
        dth_dy = tz * y / (l2 * r)
        dth_dz = -r / l2
        ds_dx = (dth_dx - s_ * x / r) / r
        ds_dy = (dth_dy - s_ * y / r) / r
        ds_dz = dth_dz / r
        j = jnp.stack(
            [
                fx * (s_ + x * ds_dx),
                fx * x * ds_dy,
                fx * x * ds_dz,
                fy * y * ds_dx,
                fy * (s_ + y * ds_dy),
                fy * y * ds_dz,
            ],
            axis=-1,
        ).reshape(t.shape[:-1] + (2, 3))
    else:
        raise ValueError(f"unknown camera model {camera_model!r}")

    cov2d = jnp.einsum("cnij,cnjk,cnlk->cnil", j, cov_cam, j)  # [C,N,2,2]
    det_raw = (
        cov2d[..., 0, 0] * cov2d[..., 1, 1] - cov2d[..., 0, 1] * cov2d[..., 1, 0]
    )
    a = cov2d[..., 0, 0] + eps2d
    c = cov2d[..., 1, 1] + eps2d
    b = cov2d[..., 0, 1]
    det = a * c - b * b
    det_safe = jnp.where(det > 0, det, 1.0)

    if antialiased:
        compensation = jnp.sqrt(jnp.maximum(det_raw / det_safe, 0.0))
    else:
        compensation = jnp.ones_like(det)
    opac = opacities[None, :] * compensation

    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    # Screen radius from the larger eigenvalue of the blurred covariance.
    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.01))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lam1))

    valid = (
        (tz > near_plane)
        & (tz < far_plane)
        & (det > 0)
        & (radius_f > radius_clip)
        & (mean2d[..., 0] + radius_f > 0)
        & (mean2d[..., 0] - radius_f < width)
        & (mean2d[..., 1] + radius_f > 0)
        & (mean2d[..., 1] - radius_f < height)
        & (opac > 1.0 / 255.0)
    )
    if alive is not None:
        valid = valid & alive[None, :]
    radii = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)

    return Projected(
        means2d=mean2d,
        conics=conic,
        depths=tz,
        radii=radii,
        opacities=opac,
    )


def view_directions(means: jnp.ndarray, camtoworlds: jnp.ndarray) -> jnp.ndarray:
    """Unit-unnormalized directions from camera centers to gaussians. [C,N,3]."""
    return means[None, :, :] - camtoworlds[:, None, :3, 3]
