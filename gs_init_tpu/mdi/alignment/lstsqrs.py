"""Closed-form scale+shift depth alignment (MiDaS eq. 2-5, arXiv 1907.01341).

Equivalent of the reference's align_depth_least_squares
(depth_alignment/alignment/lstsqrs.py:9-26), generalized with per-point
weights so masked/padded points and RANSAC inlier refits reuse one kernel.
"""
from __future__ import annotations

import jax.numpy as jnp


def weighted_scale_shift(
    pred: jnp.ndarray,  # [..., M] predicted depths at correspondence pixels
    gt: jnp.ndarray,  # [..., M] SfM depths
    w: jnp.ndarray,  # [..., M] weights (0 = ignore)
):
    """Solve min_w sum w (s*pred + t - gt)^2. Returns (s, t) broadcast over
    leading dims. Degenerate systems fall back to (1, 0)."""
    a00 = jnp.sum(w * pred * pred, axis=-1)
    a01 = jnp.sum(w * pred, axis=-1)
    a11 = jnp.sum(w, axis=-1)
    b0 = jnp.sum(w * pred * gt, axis=-1)
    b1 = jnp.sum(w * gt, axis=-1)
    det = a00 * a11 - a01 * a01
    ok = jnp.abs(det) > 1e-12
    det_safe = jnp.where(ok, det, 1.0)
    s = (a11 * b0 - a01 * b1) / det_safe
    t = (a00 * b1 - a01 * b0) / det_safe
    return jnp.where(ok, s, 1.0), jnp.where(ok, t, 0.0)


def align_lstsqrs(depth_map: jnp.ndarray, pred: jnp.ndarray, gt: jnp.ndarray, w: jnp.ndarray):
    """Align a full depth map from sparse correspondences."""
    s, t = weighted_scale_shift(pred, gt, w)
    return depth_map * s + t, (s, t)
