"""Native C++ KD-split merge subsampler + min extents."""
import numpy as np
import pytest

from gs_init_tpu.native import subsampling as native
from gs_init_tpu.mdi.postprocess import (
    compute_minimal_gaussian_extents,
    voxel_merge_subsample,
)


@pytest.fixture(scope="module", autouse=True)
def built():
    native._load()  # builds the .so if needed


def _cameras():
    vm = np.eye(4, dtype=np.float32)[None]
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], np.float32)[None]
    return vm, K, [64], [48]


def test_min_extents_matches_jax(rng):
    pts = np.stack(
        [rng.uniform(-0.2, 0.2, 500), rng.uniform(-0.15, 0.15, 500),
         rng.uniform(1, 5, 500)], -1,
    ).astype(np.float32)
    # Add points behind the camera (unobserved).
    pts[:20, 2] = -3.0
    vm, K, w, h = _cameras()
    ext_c = native.compute_min_extents(pts, vm, K, w, h)
    ext_j = compute_minimal_gaussian_extents(pts, vm, K, w, h)
    np.testing.assert_allclose(ext_c, ext_j, rtol=1e-5)
    assert (ext_c[:20] == -1).all()
    obs = ext_c[20:]
    np.testing.assert_allclose(obs, 2 * pts[20:, 2] / 100.0, rtol=1e-5)


def test_kd_merge_merges_clusters(rng):
    # 10 tight clusters of 20 points each, far apart: each should merge to ~1.
    centers = rng.uniform(-5, 5, (10, 3)).astype(np.float32)
    pts = (centers[:, None, :] + rng.normal(0, 0.001, (10, 20, 3))).reshape(
        -1, 3
    ).astype(np.float32)
    rgbs = np.repeat(rng.uniform(0, 1, (10, 3)), 20, axis=0).astype(np.float32)
    ext = np.full(len(pts), 0.5, np.float32)  # generous extent -> merge
    out_p, out_c = native.subsample_pointcloud(pts, rgbs, ext, 1.1, 1.0)
    assert len(out_p) <= 30  # massive reduction
    # Every output point is near a cluster center with its color.
    d = np.linalg.norm(out_p[:, None] - centers[None], axis=-1).min(axis=1)
    assert d.max() < 0.05


def test_kd_merge_preserves_sparse(rng):
    # Points further apart than their extents must all survive.
    pts = rng.uniform(-10, 10, (200, 3)).astype(np.float32)
    rgbs = rng.uniform(0, 1, (200, 3)).astype(np.float32)
    ext = np.full(200, 1e-4, np.float32)  # tiny allowed extent
    out_p, _ = native.subsample_pointcloud(pts, rgbs, ext, 1.1, 1.0)
    assert len(out_p) == 200
    np.testing.assert_allclose(np.sort(out_p, axis=0), np.sort(pts, axis=0), atol=1e-6)


def test_kd_merge_centroid(rng):
    pts = np.array(
        [[0, 0, 0], [0.01, 0, 0], [0, 0.01, 0], [0.005, 0.005, 0.01]],
        np.float32,
    )
    rgbs = np.array(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]], np.float32
    )
    ext = np.full(4, 1.0, np.float32)
    out_p, out_c = native.subsample_pointcloud(pts, rgbs, ext, 2.0, 1.0)
    assert len(out_p) == 1
    np.testing.assert_allclose(out_p[0], pts.mean(axis=0), atol=1e-6)
    np.testing.assert_allclose(out_c[0], rgbs.mean(axis=0), atol=1e-6)


def test_voxel_merge_approximates_native(rng):
    centers = rng.uniform(-5, 5, (20, 3)).astype(np.float32)
    pts = (centers[:, None, :] + rng.normal(0, 0.001, (20, 10, 3))).reshape(
        -1, 3
    ).astype(np.float32)
    rgbs = rng.uniform(0, 1, (200, 3)).astype(np.float32)
    ext = np.full(200, 0.5, np.float32)
    vp, _ = voxel_merge_subsample(pts, rgbs, ext, 1.0)
    np_, _ = native.subsample_pointcloud(pts, rgbs, ext, 1.1, 1.0)
    # Same order of magnitude of reduction.
    assert len(vp) <= 60 and len(np_) <= 60


def test_invalid_inputs():
    with pytest.raises(ValueError):
        native.subsample_pointcloud(
            np.zeros((4, 2), np.float32),
            np.zeros((4, 2), np.float32),
            np.zeros(4, np.float32),
        )


def test_split_strategies():
    """All three reference split strategies (impl.cpp:248-310) merge the
    cloud; equal_num_pts and max_gap produce valid (finite, bounded) output
    and the max_gap fallback path reduces counts like spatial_median."""
    native = pytest.importorskip("gs_init_tpu.native.subsampling")
    rng = np.random.default_rng(0)
    pts = np.concatenate(
        [
            rng.normal(0, 0.05, (200, 3)),
            rng.normal(2, 0.05, (200, 3)),
        ]
    ).astype(np.float32)
    rgbs = rng.uniform(0, 1, (400, 3)).astype(np.float32)
    ext = np.full(400, 0.2, np.float32)
    results = {}
    for strat in ["spatial_median", "equal_num_pts", "max_gap"]:
        p, c = native.subsample_pointcloud(
            pts, rgbs, ext, extent_multiplier=2.0, split_strategy=strat
        )
        assert 0 < len(p) < 400, strat
        assert np.isfinite(p).all() and np.isfinite(c).all()
        assert p.min() > -1.0 and p.max() < 3.0
        results[strat] = len(p)
    # Two well-separated blobs: spatial_median merges each to ~1 point.
    # equal_num_pts/max_gap split into thin equal-count slabs that rarely
    # pass the aspect gate — the reference's own comments call them
    # "doesn't really work"; we only require valid, non-trivial output.
    assert results["spatial_median"] <= 10, results
