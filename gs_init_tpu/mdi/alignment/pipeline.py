"""Depth alignment pipeline: optional segmentation -> per-region alignment.

Equivalent of the reference's DepthAlignmentPipeline
(depth_alignment/pipeline.py:176-293): with no segmenter the whole image is
one region; with SLIC segmentation, regions are merged (weak borders / few
SfM points), a margin deadzone is cut around boundaries, and each region is
aligned independently. The output is filled with the INVALID sentinel (-42)
and written per region; pixels of regions that fail (too few points) stay
invalid and are masked out downstream.

Host-level orchestration (runs once per image at init) calling jitted
alignment kernels.
"""
from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..segmentation import merge_regions, region_margin_mask, slic_depth
from .interp import align_interpolate
from .lstsqrs import weighted_scale_shift
from .ransac import ransac_scale_shift

_LOGGER = logging.getLogger(__name__)

INVALID_DEPTH = -42.0


def _align_region(
    pred_depth, pred_at, gt, pix, valid, key, method, acfg
):
    """Align one region; returns aligned depth over the FULL map."""
    if method == "lstsqrs":
        s, t = weighted_scale_shift(
            jnp.asarray(pred_at), jnp.asarray(gt),
            jnp.asarray(valid, jnp.float32),
        )
        return np.asarray(pred_depth) * float(s) + float(t)
    if method in ("ransac", "msac"):
        s, t, _ = ransac_scale_shift(
            jnp.asarray(pred_at), jnp.asarray(gt), jnp.asarray(valid), key,
            inlier_threshold=acfg.ransac.inlier_threshold,
            num_hyp=acfg.ransac.max_iterations,
            sample_size=acfg.ransac.sample_size,
            msac=(method == "msac"),
        )
        return np.asarray(pred_depth) * float(s) + float(t)
    if method == "interpolate":
        return align_interpolate(
            np.asarray(pred_depth), np.asarray(pred_at), np.asarray(gt),
            np.asarray(pix), np.asarray(valid), key, acfg,
        )
    raise ValueError(f"unknown alignment method {method!r}")


def align_depth(
    pred_depth: np.ndarray,  # [H, W]
    pred_mask: np.ndarray,  # [H, W]
    sfm_pix: np.ndarray,  # [M, 2]
    sfm_depth: np.ndarray,  # [M]
    sfm_valid: np.ndarray,  # [M]
    key,
    acfg,  # DepthAlignmentConfig
    normals: "np.ndarray | None" = None,  # [H, W, 3] for SAM use_normals
):
    """Returns (aligned_depth [H, W], mask [H, W])."""
    h, w = pred_depth.shape
    xs = np.clip(sfm_pix[:, 0].astype(int), 0, w - 1)
    ys = np.clip(sfm_pix[:, 1].astype(int), 0, h - 1)
    pred_at = pred_depth[ys, xs]
    valid = np.asarray(sfm_valid) & np.asarray(pred_mask)[ys, xs]

    seg = acfg.segmentation
    if seg.method is None:
        aligned = _align_region(
            pred_depth, pred_at, sfm_depth, sfm_pix, valid, key, acfg.method,
            acfg,
        )
        return aligned, np.asarray(pred_mask).copy()
    if seg.method == "slic":
        labels = slic_depth(
            pred_depth, np.asarray(pred_mask),
            n_segments=seg.slic_n_segments, compactness=seg.slic_compactness,
        )
    elif seg.method == "sam":
        # SAM automatic-mask segmentation on the colormapped depth
        # (reference sam.py:69-154); weights-gated on a local checkpoint.
        from ..segmentation_sam import segment_depth_sam

        labels = segment_depth_sam(
            pred_depth, np.asarray(pred_mask), normals, seg,
            allow_random_weights=seg.sam_allow_random_weights,
        )
    else:
        raise NotImplementedError(f"unknown segmenter {seg.method!r}")
    labels = merge_regions(
        labels, pred_depth, sfm_pix[valid],
        gradient_threshold=seg.merge_gradient_threshold,
        min_sfm_points=seg.merge_min_sfm_points,
    )
    aligned = np.full((h, w), INVALID_DEPTH, np.float32)
    mask = np.zeros((h, w), bool)
    pt_labels = labels[ys, xs]
    # Margin deadzone: SfM points near region boundaries are excluded from
    # the per-region FIT (reference pipeline.py:242-247 gates
    # region_sfm_point_indices on segment_deadzone_mask); the output mask
    # only loses the deadzone under propagate_mask (pipeline.py:235-236,
    # default False).
    deadzone = (
        region_margin_mask(labels, seg.region_margin)
        if seg.region_margin > 0
        else np.ones((h, w), bool)
    )
    fit_valid = valid & deadzone[ys, xs]
    min_pts = max(acfg.ransac.sample_size + 1, 4)
    for r in np.unique(labels):
        region_valid = fit_valid & (pt_labels == r)
        sel = labels == r
        if region_valid.sum() < min_pts:
            _LOGGER.debug("region %d dropped (%d pts)", r, region_valid.sum())
            continue
        key, sub = jax.random.split(key)
        a = _align_region(
            pred_depth, pred_at, sfm_depth, sfm_pix, region_valid, sub,
            acfg.method, acfg,
        )
        aligned[sel] = a[sel]
        mask[sel] = True
    if seg.propagate_mask:
        mask &= deadzone
    mask &= np.asarray(pred_mask)
    return aligned, mask
