"""Depth-map subsampling masks (static / adaptive) + SfM-density mask.

JAX equivalents of the reference's depth_subsampling package:
- static: keep every k-th row & column (static_subsampler.py:7-22)
- adaptive: depth -> IQR-clamped normalized multiplier -> per-pixel stride in
  [min,max], far pixels sampled denser (adaptive_subsampling.py:48-122)
- SfM-density mask: exclude ~20-per-side patches already containing more
  than `threshold` projected SfM points (num_sfm_points_mask.py:38-64)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def static_mask(height: int, width: int, factor: int) -> jnp.ndarray:
    yy = jnp.arange(height)[:, None] % factor == 0
    xx = jnp.arange(width)[None, :] % factor == 0
    return yy & xx


def _iqr_input_range(depth: jnp.ndarray, mask: jnp.ndarray):
    big = jnp.where(mask, depth, jnp.nan)
    q1 = jnp.nanquantile(big, 0.25)
    q3 = jnp.nanquantile(big, 0.75)
    iqr = q3 - q1
    lo = jnp.maximum(jnp.nanmin(big), q1 - 1.5 * iqr)
    hi = jnp.minimum(jnp.nanmax(big), q3 + 1.5 * iqr)
    return lo, hi


@functools.partial(jax.jit, static_argnames=("min_stride", "max_stride"))
def adaptive_mask(
    depth: jnp.ndarray,  # [H, W] aligned depth
    mask: jnp.ndarray,  # [H, W] validity
    min_stride: int = 5,
    max_stride: int = 15,
) -> jnp.ndarray:
    lo, hi = _iqr_input_range(depth, mask)
    norm = jnp.clip((depth - lo) / jnp.maximum(hi - lo, 1e-8), 0.0, 1.0)
    mult = jnp.where(mask, 1.0 - norm, 0.5)
    factor = jnp.clip(
        min_stride + mult * (max_stride - min_stride), min_stride, max_stride
    ).astype(jnp.int32)
    factor = jnp.maximum(factor, 1)
    h, w = depth.shape
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    return (yy % factor == 0) & (xx % factor == 0) & mask


def sfm_density_mask(
    sfm_xy: jnp.ndarray,  # [M, 2] projected SfM pixel coords
    sfm_valid: jnp.ndarray,  # [M]
    height: int,
    width: int,
    num_patches_small_axis: int = 20,
    threshold: int = 15,
) -> jnp.ndarray:
    """True where the patch still needs points (has <= threshold SfM pts)."""
    # Patch size derived from the smaller axis (reference
    # calculate_patch_sizes); the larger axis reuses the same base size.
    small = min(height, width)
    psize = max(small // num_patches_small_axis, 1)
    gy = -(-height // psize)
    gx = -(-width // psize)
    pidx_y = jnp.clip(sfm_xy[:, 1].astype(jnp.int32) // psize, 0, gy - 1)
    pidx_x = jnp.clip(sfm_xy[:, 0].astype(jnp.int32) // psize, 0, gx - 1)
    flat = pidx_y * gx + pidx_x
    counts = jnp.zeros((gy * gx,), jnp.int32).at[
        jnp.where(sfm_valid, flat, gy * gx)
    ].add(1, mode="drop")
    keep_patch = (counts <= threshold).reshape(gy, gx)
    yy = jnp.arange(height)[:, None] // psize
    xx = jnp.arange(width)[None, :] // psize
    return keep_patch[jnp.clip(yy, 0, gy - 1), jnp.clip(xx, 0, gx - 1)]


def depth_gradient_mask(depth: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Mask of pixels whose normalized forward-difference depth gradient is
    below threshold (reference points_from_depth.py:192-213).

    Non-finite depths (masked/invalid pixels — e.g. NaN from a predictor's
    validity mask, or the alignment INVALID sentinel) are sanitized to 0
    first: a single NaN otherwise poisons the max-normalization and the
    comparison masks EVERY pixel. The valid<->invalid boundary then carries
    a huge gradient and is masked, which is the desired behavior."""
    depth = jnp.where(jnp.isfinite(depth), depth, 0.0)
    dx = jnp.abs(depth[:, 1:] - depth[:, :-1])
    dy = jnp.abs(depth[1:, :] - depth[:-1, :])
    g = jnp.zeros_like(depth)
    g = g.at[:, 1:].add(dx)
    g = g.at[1:, :].add(dy)
    g = g - g.min()
    g = g / (g.max() + 1e-8)
    return g <= threshold
