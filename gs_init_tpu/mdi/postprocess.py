"""Point-cloud postprocessing: LOF outlier removal + merge subsampling.

Equivalent of the reference's postprocess_point_cloud
(point_cloud_postprocess/postprocess.py:32-77). The merge subsampler has two
implementations:
- "native": exact C++ KD-split merge (native/ shared library via ctypes),
  mirroring the reference's pybind module (native_modules/subsampling)
- "voxel": device-side approximation — points are voxelized at a resolution
  derived from the per-point minimal gaussian extent and merged to centroids
  (TPU-friendly: sort + segment means, no recursion)
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.lof import lof_inlier_mask


def lof_outlier_removal(
    pts: np.ndarray, rgbs: np.ndarray, k: int = 40, threshold: float = 1.5
) -> Tuple[np.ndarray, np.ndarray]:
    mask = np.asarray(lof_inlier_mask(jnp.asarray(pts), k=k, threshold=threshold))
    return pts[mask], rgbs[mask]


def compute_minimal_gaussian_extents(
    pts: np.ndarray,  # [N, 3]
    viewmats: np.ndarray,  # [C, 4, 4]
    Ks: np.ndarray,  # [C, 3, 3]
    widths, heights,
) -> np.ndarray:
    """World-space sampling interval per point: min over observing cameras of
    2*depth/min(fx, fy); -1 if unobserved. Batched matmul + mask reduction —
    the TPU formulation of the reference's O(N*C) loop (impl.cpp:70-126)."""
    pts = jnp.asarray(pts, jnp.float32)
    vm = jnp.asarray(viewmats, jnp.float32)
    cam = jnp.einsum("cij,nj->cni", vm[:, :3, :3], pts) + vm[:, None, :3, 3]
    z = cam[..., 2]
    f = jnp.minimum(Ks[:, 0, 0], Ks[:, 1, 1])[:, None]
    uv = cam[..., :2] / jnp.maximum(z[..., None], 1e-8)
    pix = jnp.einsum("cni,cij->cnj", uv, jnp.transpose(jnp.asarray(Ks)[:, :2, :2], (0, 2, 1))) + jnp.asarray(Ks)[:, None, :2, 2]
    w = jnp.asarray(widths, jnp.float32)[:, None]
    h = jnp.asarray(heights, jnp.float32)[:, None]
    seen = (
        (z > 0)
        & (pix[..., 0] >= 0)
        & (pix[..., 0] < w)
        & (pix[..., 1] >= 0)
        & (pix[..., 1] < h)
    )
    extent = jnp.where(seen, 2.0 * z / f, jnp.inf)
    best = jnp.min(extent, axis=0)
    return np.asarray(jnp.where(jnp.isfinite(best), best, -1.0))


def voxel_merge_subsample(
    pts: np.ndarray,
    rgbs: np.ndarray,
    extents: np.ndarray,
    extent_multiplier: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Merge points into voxel centroids sized by the average minimal extent.

    Device-friendly approximation of the C++ KD-split merge: the exact
    algorithm merges leaves whose tight bbox diagonal is below
    mult * avg-min-extent; a voxel grid at that size merges the same
    neighborhoods without recursion.
    """
    observed = extents > 0
    if not observed.any():
        return pts, rgbs
    vox = float(np.mean(extents[observed])) * extent_multiplier
    if vox <= 0:
        return pts, rgbs
    keys = np.floor(pts / vox).astype(np.int64)
    # Unique voxel -> mean position/color.
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    n = len(uniq)
    sums = np.zeros((n, 3), np.float64)
    np.add.at(sums, inv, pts)
    csums = np.zeros((n, 3), np.float64)
    np.add.at(csums, inv, rgbs)
    counts = np.bincount(inv, minlength=n)[:, None]
    return (sums / counts).astype(np.float32), (csums / counts).astype(
        np.float32
    )


def native_merge_subsample(
    pts: np.ndarray,
    rgbs: np.ndarray,
    extents: np.ndarray,
    max_aspect_ratio: float = 1.1,
    extent_multiplier: float = 1.0,
):
    """Exact KD-split merge via the C++ module; falls back to voxel merge
    when the native library is not built."""
    try:
        from ..native import subsampling as native
    except (ImportError, OSError):
        return voxel_merge_subsample(pts, rgbs, extents, extent_multiplier)
    return native.subsample_pointcloud(
        pts, rgbs, extents, max_aspect_ratio, extent_multiplier
    )


def postprocess_point_cloud(cfg, pts, rgbs, viewmats, Ks, widths, heights):
    pp = cfg.mdi.postprocess
    if pp.lof_outlier_removal:
        pts, rgbs = lof_outlier_removal(pts, rgbs, k=pp.lof_neighbors)
    if pp.merge_subsample:
        extents = compute_minimal_gaussian_extents(
            pts, viewmats, Ks, widths, heights
        )
        if pp.merge_impl == "native":
            pts, rgbs = native_merge_subsample(
                pts, rgbs, extents, pp.merge_max_aspect_ratio,
                pp.merge_extent_multiplier,
            )
        else:
            pts, rgbs = voxel_merge_subsample(
                pts, rgbs, extents, pp.merge_extent_multiplier
            )
    return pts, rgbs
