"""Interpolated (spatially-varying scale) depth alignment.

Equivalent of the reference's align_depth_interpolate
(depth_alignment/alignment/interp.py:281-361): pre-align globally
(RANSAC/MSAC/lstsqrs), compute per-SfM-point residual scale factors
gt / prealigned, remove scale outliers (kNN-median + LOF), interpolate a
dense scale map with a thin-plate RBF on a coarse grid, multiply. Falls back
to the median scale on failure (interp.py:354-359).
"""
from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.lof import lof_scores
from ...ops.rbf import tps_interpolate_grid
from .lstsqrs import weighted_scale_shift
from .ransac import ransac_scale_shift

_LOGGER = logging.getLogger(__name__)


def _scale_outliers(
    pix: np.ndarray,  # [M, 2]
    factors: np.ndarray,  # [M]
    valid: np.ndarray,
    knn_k: int = 8,
    knn_threshold: float = 2.0,
    lof_k: int = 20,
    lof_threshold: float = 1.5,
) -> np.ndarray:
    """Inlier mask for per-point scale factors (kNN-median + LOF)."""
    idx = np.where(valid)[0]
    if len(idx) < max(knn_k, lof_k) + 2:
        return valid
    p = pix[idx]
    f = factors[idx]
    d2 = ((p[:, None, :] - p[None, :, :]) ** 2).sum(-1)
    nn = np.argsort(d2, axis=1)[:, 1 : knn_k + 1]
    med = np.median(f[nn], axis=1)
    mad = np.median(np.abs(f[nn] - med[:, None]), axis=1) + 1e-6
    keep = np.abs(f - med) <= knn_threshold * 3.0 * mad
    # LOF over (x, y, factor) with normalized coordinates.
    feats = np.concatenate(
        [p / max(p.max(), 1.0), f[:, None] / max(np.median(np.abs(f)), 1e-6)],
        axis=1,
    ).astype(np.float32)
    scores = np.asarray(lof_scores(jnp.asarray(feats), k=min(lof_k, len(idx) - 2)))
    keep &= scores <= lof_threshold
    out = valid.copy()
    out[idx] = keep
    return out


def _delaunay_scale_map(
    pix: np.ndarray, factors: np.ndarray, h: int, w: int, grid_width: int
) -> np.ndarray:
    """Piecewise-linear scale map over the Delaunay triangulation of the
    inlier points, with median-weighted image corners appended so the hull
    covers the frame (the reference's corner-fill trick, interp.py:75-110).
    Evaluated on a coarse grid then bilinearly upsampled."""
    from scipy.interpolate import LinearNDInterpolator

    med = float(np.median(factors))
    corners = np.array(
        [[0, 0], [w - 1, 0], [0, h - 1], [w - 1, h - 1]], np.float32
    )
    pts = np.concatenate([pix, corners])
    vals = np.concatenate([factors, np.full(4, med, np.float32)])
    interp = LinearNDInterpolator(pts, vals, fill_value=med)
    gw = min(grid_width, w)
    gh = max(int(round(h * gw / w)), 1)
    xs = (np.arange(gw) + 0.5) * (w / gw)
    ys = (np.arange(gh) + 0.5) * (h / gh)
    gx, gy = np.meshgrid(xs, ys)
    coarse = interp(np.stack([gx.ravel(), gy.ravel()], -1)).reshape(gh, gw)
    import jax

    return np.asarray(
        jax.image.resize(jnp.asarray(coarse, jnp.float32), (h, w), "bilinear")
    )


def align_interpolate(
    pred_depth: np.ndarray,  # [H, W]
    pred_at: np.ndarray,  # [M] predicted depth at correspondences
    gt: np.ndarray,  # [M]
    pix: np.ndarray,  # [M, 2]
    valid: np.ndarray,  # [M]
    key,
    cfg,
) -> np.ndarray:
    """Returns aligned depth [H, W]."""
    h, w = pred_depth.shape
    icfg = cfg.interp
    if icfg.prealign == "lstsqrs":
        s, t = weighted_scale_shift(
            jnp.asarray(pred_at), jnp.asarray(gt), jnp.asarray(valid, jnp.float32)
        )
        s, t = float(s), float(t)
    else:
        s, t, _ = ransac_scale_shift(
            jnp.asarray(pred_at),
            jnp.asarray(gt),
            jnp.asarray(valid),
            key,
            inlier_threshold=cfg.ransac.inlier_threshold,
            num_hyp=cfg.ransac.max_iterations,
            sample_size=cfg.ransac.sample_size,
            msac=(icfg.prealign == "msac"),
        )
        s, t = float(s), float(t)

    prealigned_at = s * pred_at + t
    factors = np.where(
        valid & (np.abs(prealigned_at) > 1e-8), gt / np.maximum(prealigned_at, 1e-8), 1.0
    )
    if icfg.scale_outlier_removal:
        keep = _scale_outliers(
            pix, factors, valid & (prealigned_at > 0),
            knn_k=icfg.knn_median_neighbors,
            knn_threshold=icfg.knn_median_threshold,
            lof_k=icfg.lof_neighbors,
            lof_threshold=icfg.lof_threshold,
        )
    else:
        keep = valid & (prealigned_at > 0)
    try:
        if keep.sum() < 8:
            raise ValueError(f"too few scale inliers ({int(keep.sum())})")
        if icfg.method == "delaunay":
            scale_map = _delaunay_scale_map(
                pix[keep], factors[keep], h, w, icfg.rbf_grid_width
            )
        else:
            if icfg.kernel != "thin_plate_spline":
                raise NotImplementedError(
                    f"RBF kernel {icfg.kernel!r} not implemented "
                    "(ops/rbf.py is thin_plate_spline only)"
                )
            if 0 < icfg.max_rbf_points < int(keep.sum()):
                # Cap the dense O(M^3) TPS solve (reference
                # InterpConfig.max_rbf_points): keep a uniform random
                # subset of the inliers, seeded from the alignment key.
                seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
                idx = np.where(keep)[0]
                drop = np.random.default_rng(seed).choice(
                    idx, size=len(idx) - icfg.max_rbf_points, replace=False
                )
                keep = keep.copy()
                keep[drop] = False
            scale_map = np.asarray(
                tps_interpolate_grid(
                    jnp.asarray(pix, jnp.float32),
                    jnp.asarray(factors, jnp.float32),
                    jnp.asarray(keep),
                    h,
                    w,
                    grid_width=icfg.rbf_grid_width,
                    smoothing=icfg.smoothing,
                )
            )
        if not np.isfinite(scale_map).all():
            raise ValueError("non-finite scale map")
        # Guard against wild extrapolation far from correspondences.
        lo, hi = np.percentile(factors[keep], [1, 99])
        scale_map = np.clip(scale_map, min(lo, 0.5), max(hi, 2.0))
    except Exception as e:  # median-scale fallback (reference interp.py:354)
        _LOGGER.warning("scale-map interpolation failed (%s); median fallback", e)
        med = float(np.median(factors[keep])) if keep.any() else 1.0
        scale_map = np.full((h, w), med, np.float32)
    return (s * pred_depth + t) * scale_map
