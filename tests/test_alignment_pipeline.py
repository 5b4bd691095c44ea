"""Interpolated alignment, TPS, SLIC segmentation, pipeline path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs_init_tpu.config import DepthAlignmentConfig
from gs_init_tpu.mdi.alignment.interp import align_interpolate
from gs_init_tpu.mdi.alignment.pipeline import align_depth
from gs_init_tpu.mdi.segmentation import (
    merge_regions,
    region_margin_mask,
    slic_depth,
)
from gs_init_tpu.ops.rbf import tps_fit, tps_eval, tps_interpolate_grid


def test_tps_interpolates_exactly(rng):
    centers = jnp.asarray(rng.uniform(0, 100, (30, 2)), jnp.float32)
    vals = jnp.asarray(rng.normal(size=30), jnp.float32)
    w, p = tps_fit(centers, vals, jnp.ones(30, bool))
    got = tps_eval(centers, w, p, centers)
    np.testing.assert_allclose(np.asarray(got), np.asarray(vals), atol=1e-3)


def test_tps_padding_ignored(rng):
    centers = jnp.asarray(rng.uniform(0, 100, (40, 2)), jnp.float32)
    vals = jnp.asarray(rng.normal(size=40), jnp.float32)
    valid = jnp.arange(40) < 30
    w1, p1 = tps_fit(centers[:30], vals[:30], jnp.ones(30, bool))
    w2, p2 = tps_fit(centers, vals, valid)
    q = jnp.asarray(rng.uniform(10, 90, (8, 2)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(tps_eval(centers[:30], w1, p1, q)),
        np.asarray(tps_eval(centers, w2, p2, q)),
        atol=1e-2,
    )
    assert float(jnp.abs(w2[30:]).max()) < 1e-5


def test_tps_grid_recovers_linear_field(rng):
    h, w = 40, 60
    centers = jnp.asarray(rng.uniform(0, [w, h], (50, 2)), jnp.float32)
    vals = 0.01 * centers[:, 0] + 0.02 * centers[:, 1] + 1.0
    m = tps_interpolate_grid(centers, vals, jnp.ones(50, bool), h, w, 32)
    xs, ys = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    expect = 0.01 * xs + 0.02 * ys + 1.0
    np.testing.assert_allclose(np.asarray(m), expect, atol=0.05)


def test_align_interpolate_recovers_varying_scale(rng):
    """Spatially varying distortion (linear ramp) is recovered by the TPS
    scale map where global scale+shift alone cannot."""
    h, w = 48, 64
    xs, ys = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    true_depth = (2.0 + 0.01 * xs + 0.02 * ys).astype(np.float32)
    ramp = (1.0 + 0.5 * xs / w).astype(np.float32)  # multiplicative field
    pred = true_depth / ramp  # distorted prediction

    m = 250
    px = rng.uniform(0, w - 1, m)
    py = rng.uniform(0, h - 1, m)
    pix = np.stack([px, py], -1).astype(np.float32)
    gt = true_depth[py.astype(int), px.astype(int)]
    pred_at = pred[py.astype(int), px.astype(int)]
    cfg = DepthAlignmentConfig()
    cfg.interp.rbf_grid_width = 32
    cfg.ransac.max_iterations = 300
    aligned = align_interpolate(
        pred, pred_at, gt, pix, np.ones(m, bool), jax.random.PRNGKey(0), cfg
    )
    rel = np.abs(aligned - true_depth) / true_depth
    assert np.median(rel) < 0.03
    # Global affine alone leaves much larger error on this field.
    from gs_init_tpu.mdi.alignment.lstsqrs import weighted_scale_shift

    s, t = weighted_scale_shift(
        jnp.asarray(pred_at), jnp.asarray(gt), jnp.ones(m)
    )
    rel_global = np.abs(float(s) * pred + float(t) - true_depth) / true_depth
    assert np.median(rel) < np.median(rel_global) * 0.5


def test_slic_segments_depth_discontinuity():
    h, w = 40, 60
    depth = np.ones((h, w), np.float32)
    depth[:, w // 2 :] = 5.0
    labels = slic_depth(depth, np.ones((h, w), bool), n_segments=12)
    left = labels[:, : w // 2 - 2]
    right = labels[:, w // 2 + 2 :]
    # No label spans the discontinuity.
    assert not (np.isin(left, np.unique(right))).any()


def test_merge_regions_absorbs_weak_borders(rng):
    h, w = 30, 40
    depth = np.ones((h, w), np.float32)
    depth[:, w // 2 :] = 5.0
    labels = slic_depth(depth, np.ones((h, w), bool), n_segments=16)
    n_before = len(np.unique(labels))
    sfm = np.stack(
        [rng.uniform(0, w - 1, 100), rng.uniform(0, h - 1, 100)], -1
    )
    merged = merge_regions(labels, depth / 5.0, sfm, gradient_threshold=0.01,
                           min_sfm_points=2)
    n_after = len(np.unique(merged))
    assert 2 <= n_after < n_before  # halves merged, discontinuity kept
    # The depth discontinuity must survive merging.
    assert merged[15, 5] != merged[15, 35]


def test_region_margin_mask():
    labels = np.zeros((20, 40), np.int32)
    labels[:, 20:] = 1
    m = region_margin_mask(labels, margin=60.0)
    assert not m[10, 20] and not m[10, 19]
    assert m[10, 2] and m[10, 38]


def test_pipeline_with_segmentation(rng):
    """Two-plane scene with per-plane affine distortion: per-region
    alignment recovers both planes; single global alignment cannot."""
    h, w = 40, 60
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    # Two slanted planes with a depth discontinuity (scale+shift needs depth
    # variation inside each region to be well-posed).
    true = 2.0 + 0.01 * xs + 0.02 * ys
    true[:, w // 2 :] += 4.0
    true = true.astype(np.float32)
    # Different distortions per plane (simulates region-dependent scale).
    pred = true.copy()
    pred[:, : w // 2] = true[:, : w // 2] * 0.5 + 0.3
    pred[:, w // 2 :] = true[:, w // 2 :] * 1.5 - 1.0
    m = 300
    px = rng.uniform(0, w - 1, m)
    py = rng.uniform(0, h - 1, m)
    pix = np.stack([px, py], -1).astype(np.float32)
    gt = true[py.astype(int), px.astype(int)]
    acfg = DepthAlignmentConfig()
    acfg.method = "lstsqrs"
    acfg.segmentation.method = "slic"
    acfg.segmentation.slic_n_segments = 12
    acfg.segmentation.merge_gradient_threshold = 0.01
    aligned, mask = align_depth(
        pred, np.ones((h, w), bool), pix, gt, np.ones(m, bool),
        jax.random.PRNGKey(0), acfg,
    )
    rel = np.abs(aligned[mask] - true[mask]) / true[mask]
    assert np.median(rel) < 0.02
    # Global-only alignment on this data is far worse.
    acfg2 = DepthAlignmentConfig()
    acfg2.method = "lstsqrs"
    aligned_g, mask_g = align_depth(
        pred, np.ones((h, w), bool), pix, gt, np.ones(m, bool),
        jax.random.PRNGKey(0), acfg2,
    )
    rel_g = np.abs(aligned_g[mask_g] - true[mask_g]) / true[mask_g]
    assert np.median(rel) < np.median(rel_g) * 0.5


def test_align_interpolate_delaunay_variant(rng):
    """Delaunay scale map recovers a varying distortion like the RBF path."""
    h, w = 48, 64
    xs, ys = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    true_depth = (2.0 + 0.01 * xs + 0.02 * ys).astype(np.float32)
    ramp = (1.0 + 0.5 * xs / w).astype(np.float32)
    pred = true_depth / ramp
    m = 250
    px = rng.uniform(0, w - 1, m)
    py = rng.uniform(0, h - 1, m)
    pix = np.stack([px, py], -1).astype(np.float32)
    gt = true_depth[py.astype(int), px.astype(int)]
    pred_at = pred[py.astype(int), px.astype(int)]
    cfg = DepthAlignmentConfig()
    cfg.interp.method = "delaunay"
    cfg.interp.rbf_grid_width = 32
    cfg.ransac.max_iterations = 300
    aligned = align_interpolate(
        pred, pred_at, gt, pix, np.ones(m, bool), jax.random.PRNGKey(0), cfg
    )
    rel = np.abs(aligned - true_depth) / true_depth
    assert np.median(rel) < 0.04


def test_propagate_mask_semantics(rng):
    """The margin deadzone always excludes SfM points from the per-region
    FIT; it cuts the output mask only under propagate_mask (reference
    pipeline.py:235-247, default False)."""
    h, w = 40, 60
    xs, ys = np.meshgrid(
        np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32)
    )
    true = 2.0 + 0.01 * xs + 0.02 * ys
    true[:, w // 2 :] += 4.0
    true = true.astype(np.float32)
    pred = true * 0.5 + 0.3
    m = 300
    px = rng.uniform(0, w - 1, m)
    py = rng.uniform(0, h - 1, m)
    pix = np.stack([px, py], -1).astype(np.float32)
    gt = true[py.astype(int), px.astype(int)]

    def run(propagate, margin=60.0):
        acfg = DepthAlignmentConfig()
        acfg.method = "lstsqrs"
        acfg.segmentation.method = "slic"
        acfg.segmentation.slic_n_segments = 12
        acfg.segmentation.merge_gradient_threshold = 0.01
        acfg.segmentation.region_margin = margin
        acfg.segmentation.propagate_mask = propagate
        return align_depth(
            pred, np.ones((h, w), bool), pix, gt, np.ones(m, bool),
            jax.random.PRNGKey(0), acfg,
        )

    _, mask_off = run(False)
    _, mask_on = run(True)
    # propagate=False keeps boundary pixels in the output; True cuts them.
    assert mask_off.sum() > mask_on.sum()
    # The cut pixels are exactly deadzone pixels of regions that aligned.
    assert not (mask_on & ~mask_off).any()
