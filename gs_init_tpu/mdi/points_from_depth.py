"""Depth map -> world-space points: the per-image core of monocular init.

JAX re-design of the reference's get_pts_from_depth
(depth_prediction/points_from_depth.py:215-329): project the image's SfM
points with P = K R [I|-C], filter validity (an image whose valid fraction
is below min_valid_sfm_fraction is skipped), align the predicted depth to
metric scale, combine masks (validity AND aligned>=0 AND optional
depth-gradient AND optional SfM-density AND subsampling), and unproject
surviving pixels (+0.5 center offset) through K^-1 to world space.

Static shapes: SfM correspondences are padded to a fixed M; the unprojection
returns a fixed [H*W] point buffer + boolean mask (the host compacts it).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .alignment.lstsqrs import align_lstsqrs
from .alignment.ransac import ransac_scale_shift
from .subsampling import (
    adaptive_mask,
    depth_gradient_mask,
    sfm_density_mask,
    static_mask,
)


class PointsFromDepth(NamedTuple):
    pts_world: jnp.ndarray  # [H*W, 3]
    mask: jnp.ndarray  # [H*W] bool — valid output points
    valid_sfm_fraction: jnp.ndarray  # [] fraction of SfM pts that projected
    scale: jnp.ndarray  # [] alignment scale
    shift: jnp.ndarray  # [] alignment shift


def project_sfm_points(
    sfm_points: jnp.ndarray,  # [M, 3] world (padded)
    sfm_valid: jnp.ndarray,  # [M]
    viewmat: jnp.ndarray,  # [4, 4] world->cam
    K: jnp.ndarray,  # [3, 3]
    width: int,
    height: int,
):
    cam = sfm_points @ viewmat[:3, :3].T + viewmat[:3, 3]
    z = cam[:, 2]
    uv = cam[:, :2] / jnp.maximum(z[:, None], 1e-8)
    pix = uv @ K[:2, :2].T + K[:2, 2]
    ok = (
        sfm_valid
        & (z > 0)
        & (pix[:, 0] >= 0)
        & (pix[:, 0] < width)
        & (pix[:, 1] >= 0)
        & (pix[:, 1] < height)
    )
    return pix, z, ok


def _sample_depth_at(depth: jnp.ndarray, pix: jnp.ndarray) -> jnp.ndarray:
    """Nearest (floor) sampling — matches the reference's integer indexing."""
    x = jnp.clip(pix[:, 0].astype(jnp.int32), 0, depth.shape[1] - 1)
    y = jnp.clip(pix[:, 1].astype(jnp.int32), 0, depth.shape[0] - 1)
    return depth[y, x]


@functools.partial(
    jax.jit,
    static_argnames=(
        "width",
        "height",
        "align_method",
        "subsample_method",
        "subsample_factor",
        "min_stride",
        "max_stride",
        "use_grad_mask",
        "grad_threshold",
        "use_sfm_density_mask",
        "ransac_iters",
        "ransac_threshold",
        "sample_size",
    ),
)
def points_from_depth(
    pred_depth: jnp.ndarray,  # [H, W]
    pred_mask: jnp.ndarray,  # [H, W]
    camtoworld: jnp.ndarray,  # [4, 4]
    K: jnp.ndarray,  # [3, 3]
    sfm_points: jnp.ndarray,  # [M, 3] padded
    sfm_valid: jnp.ndarray,  # [M]
    key: jax.Array,
    *,
    width: int,
    height: int,
    align_method: str = "ransac",
    subsample_method: str = "static",
    subsample_factor: int = 10,
    min_stride: int = 5,
    max_stride: int = 15,
    use_grad_mask: bool = False,
    grad_threshold: float = 0.1,
    use_sfm_density_mask: bool = False,
    ransac_iters: int = 2500,
    ransac_threshold: float = 0.01,
    sample_size: int = 4,
) -> PointsFromDepth:
    viewmat = jnp.linalg.inv(camtoworld)
    pix, gt_z, ok = project_sfm_points(
        sfm_points, sfm_valid, viewmat, K, width, height
    )
    n_input = jnp.maximum(jnp.sum(sfm_valid), 1)
    valid_fraction = jnp.sum(ok) / n_input

    pred_at = _sample_depth_at(pred_depth, pix)
    corr_ok = ok & _sample_depth_at(pred_mask, pix)

    if align_method == "lstsqrs":
        aligned, (s, t) = align_lstsqrs(
            pred_depth, pred_at, gt_z, corr_ok.astype(jnp.float32)
        )
    elif align_method in ("ransac", "msac"):
        s, t, _ = ransac_scale_shift(
            pred_at,
            gt_z,
            corr_ok,
            key,
            inlier_threshold=ransac_threshold,
            num_hyp=ransac_iters,
            sample_size=sample_size,
            msac=(align_method == "msac"),
        )
        aligned = pred_depth * s + t
    else:
        raise ValueError(f"unknown alignment {align_method!r}")

    mask = _combine_masks(
        aligned, pred_mask, pix, ok, width, height,
        subsample_method, subsample_factor, min_stride, max_stride,
        use_grad_mask, grad_threshold, use_sfm_density_mask,
    )
    world = _unproject(aligned, camtoworld, K, width, height)
    return PointsFromDepth(
        pts_world=world,
        mask=mask.reshape(-1),
        valid_sfm_fraction=valid_fraction,
        scale=jnp.asarray(s),
        shift=jnp.asarray(t),
    )


def _combine_masks(
    aligned, pred_mask, pix, ok, width, height,
    subsample_method, subsample_factor, min_stride, max_stride,
    use_grad_mask, grad_threshold, use_sfm_density_mask,
):
    mask = pred_mask & (aligned >= 0)
    if use_grad_mask:
        mask = mask & depth_gradient_mask(aligned, grad_threshold)
    if use_sfm_density_mask:
        mask = mask & sfm_density_mask(pix, ok, height, width)
    if subsample_method == "static":
        sub = static_mask(height, width, subsample_factor)
    elif subsample_method == "adaptive":
        sub = adaptive_mask(aligned, pred_mask, min_stride, max_stride)
    else:
        raise ValueError(f"unknown subsampling {subsample_method!r}")
    return mask & sub


def _unproject(aligned, camtoworld, K, width, height):
    """(u+.5, v+.5, 1) * z -> K^-1 -> cam2world for every pixel."""
    ys = jnp.arange(height, dtype=jnp.float32)[:, None]
    xs = jnp.arange(width, dtype=jnp.float32)[None, :]
    z = aligned
    homo = jnp.stack(
        [(xs + 0.5) * z, (ys + 0.5) * z, z], axis=-1
    ).reshape(-1, 3)
    cam = homo @ jnp.linalg.inv(K).T
    return cam @ camtoworld[:3, :3].T + camtoworld[:3, 3]


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "subsample_method", "subsample_factor",
        "min_stride", "max_stride", "use_grad_mask", "grad_threshold",
        "use_sfm_density_mask",
    ),
)
def masks_and_unproject(
    aligned: jnp.ndarray,  # [H, W] host-aligned depth (pipeline path)
    align_mask: jnp.ndarray,  # [H, W] validity from the alignment pipeline
    camtoworld: jnp.ndarray,
    K: jnp.ndarray,
    sfm_pix: jnp.ndarray,  # [M, 2]
    sfm_ok: jnp.ndarray,  # [M]
    *,
    width: int,
    height: int,
    subsample_method: str = "static",
    subsample_factor: int = 10,
    min_stride: int = 5,
    max_stride: int = 15,
    use_grad_mask: bool = False,
    grad_threshold: float = 0.1,
    use_sfm_density_mask: bool = False,
):
    """Jitted tail of the pipeline path (segmentation / interpolated scale):
    mask combination + unprojection for an already-aligned depth map."""
    mask = _combine_masks(
        aligned, align_mask, sfm_pix, sfm_ok, width, height,
        subsample_method, subsample_factor, min_stride, max_stride,
        use_grad_mask, grad_threshold, use_sfm_density_mask,
    )
    world = _unproject(aligned, camtoworld, K, width, height)
    return world, mask.reshape(-1)
