"""Monocular-depth-init pipeline: alignment, subsampling, unprojection, init."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs_init_tpu.config import Config
from gs_init_tpu.datasets.synthetic import make_scene
from gs_init_tpu.mdi.alignment.lstsqrs import weighted_scale_shift
from gs_init_tpu.mdi.alignment.ransac import ransac_scale_shift
from gs_init_tpu.mdi.points_from_depth import points_from_depth, project_sfm_points
from gs_init_tpu.mdi.subsampling import (
    adaptive_mask,
    depth_gradient_mask,
    sfm_density_mask,
    static_mask,
)
from gs_init_tpu.ops.lof import lof_inlier_mask, lof_scores


def test_lstsqrs_recovers_affine(rng):
    d = jnp.asarray(rng.uniform(1, 5, 200), jnp.float32)
    gt = 2.5 * d + 0.7
    s, t = weighted_scale_shift(d, gt, jnp.ones_like(d))
    assert float(s) == pytest.approx(2.5, abs=1e-4)
    assert float(t) == pytest.approx(0.7, abs=1e-4)
    # Weights: corrupted half ignored.
    gt2 = gt.at[:100].set(100.0)
    w = jnp.ones_like(d).at[:100].set(0.0)
    s2, t2 = weighted_scale_shift(d, gt2, w)
    assert float(s2) == pytest.approx(2.5, abs=1e-3)


def test_ransac_robust_to_outliers(rng):
    m = 400
    d = rng.uniform(1, 5, m).astype(np.float32)
    gt = 0.8 * d + 0.3
    out_idx = rng.choice(m, 120, replace=False)
    gt[out_idx] += rng.uniform(1, 10, 120)  # gross outliers
    valid = np.ones(m, bool)
    # Padding entries must not affect the result.
    d_pad = np.concatenate([d, np.zeros(56, np.float32)])
    gt_pad = np.concatenate([gt, np.full(56, 1e6, np.float32)])
    v_pad = np.concatenate([valid, np.zeros(56, bool)])
    s, t, inl = ransac_scale_shift(
        jnp.asarray(d_pad), jnp.asarray(gt_pad), jnp.asarray(v_pad),
        jax.random.PRNGKey(0), num_hyp=500,
    )
    assert float(s) == pytest.approx(0.8, abs=0.02)
    assert float(t) == pytest.approx(0.3, abs=0.05)
    inl = np.asarray(inl)
    assert not inl[m:].any()
    assert inl[:m].sum() >= 250  # most clean points are inliers
    # Plain least squares would be badly biased by these outliers.
    s_ls, t_ls = weighted_scale_shift(
        jnp.asarray(d), jnp.asarray(gt), jnp.ones(m)
    )
    assert abs(float(s_ls) - 0.8) + abs(float(t_ls) - 0.3) > 0.2


def test_ransac_rejects_nonpositive_scale(rng):
    """Narrow-depth-range correspondences with heavy noise: a constant or
    negative-slope model can inlier-count as well as the true one, but a
    depth-alignment scale must be positive (ransac.py docstring; observed
    s=-0.40 on the clustered e2e proxy before the prior landed)."""
    m = 60
    d = rng.uniform(2.2, 2.6, m).astype(np.float32)  # narrow predicted range
    gt = 0.9 * d - 1.2
    noisy = rng.choice(m, 40, replace=False)  # 2/3 corrupted, biased up
    gt = gt.copy()
    gt[noisy] += rng.uniform(0.05, 0.5, 40).astype(np.float32)
    for seed in range(5):
        s, t, _ = ransac_scale_shift(
            jnp.asarray(d), jnp.asarray(gt), jnp.ones(m, bool),
            jax.random.PRNGKey(seed), num_hyp=800,
        )
        assert float(s) > 0.0, f"seed {seed} returned s={float(s)}"


def test_ransac_all_negative_fallback(rng):
    """When EVERY hypothesis has s <= 0 (anti-correlated depths), the
    positive-scale prior must fall back to the median-ratio alignment
    instead of silently returning the degenerate non-positive fit."""
    m = 64
    d = rng.uniform(1.0, 5.0, m).astype(np.float32)
    gt = (-0.8 * d + 6.0).astype(np.float32)  # strictly anti-correlated
    s, t, _ = ransac_scale_shift(
        jnp.asarray(d), jnp.asarray(gt), jnp.ones(m, bool),
        jax.random.PRNGKey(0), num_hyp=400,
    )
    assert float(s) > 0.0
    assert float(s) == pytest.approx(
        float(np.median(gt) / np.median(d)), rel=0.1
    )
    assert float(t) == 0.0


def test_msac_variant(rng):
    d = rng.uniform(1, 5, 200).astype(np.float32)
    gt = 1.5 * d - 0.2
    gt[:40] += 5.0
    s, t, _ = ransac_scale_shift(
        jnp.asarray(d), jnp.asarray(gt), jnp.ones(200, bool),
        jax.random.PRNGKey(1), num_hyp=400, msac=True,
    )
    assert float(s) == pytest.approx(1.5, abs=0.05)


def test_static_mask():
    m = np.asarray(static_mask(20, 30, 10))
    assert m.sum() == 2 * 3
    assert m[0, 0] and m[10, 20] and not m[5, 5]


def test_adaptive_mask_denser_far(rng):
    h, w = 60, 90
    depth = np.broadcast_to(np.linspace(1, 10, w)[None, :], (h, w)).astype(
        np.float32
    )
    mask = np.ones((h, w), bool)
    m = np.asarray(adaptive_mask(jnp.asarray(depth), jnp.asarray(mask), 2, 8))
    near = m[:, : w // 3].mean()
    far = m[:, -w // 3 :].mean()
    assert far > near * 2  # far pixels sampled denser


def test_sfm_density_mask():
    # 50 points crammed into the top-left patch exclude it.
    xy = np.full((50, 2), 1.0, np.float32)
    m = np.asarray(
        sfm_density_mask(
            jnp.asarray(xy), jnp.ones(50, bool), 100, 100,
            num_patches_small_axis=10, threshold=15,
        )
    )
    assert not m[:5, :5].any()
    assert m[50:, 50:].all()


def test_depth_gradient_mask():
    depth = np.ones((20, 20), np.float32)
    depth[:, 10:] = 5.0  # sharp edge at column 10
    m = np.asarray(depth_gradient_mask(jnp.asarray(depth), 0.3))
    assert not m[5, 10]
    assert m[5, 3] and m[5, 16]


def test_depth_gradient_mask_nan_safe():
    """NaN depths (masked-out pixels) must not poison the normalization —
    a single NaN used to make the comparison mask EVERY pixel (zeroing the
    whole mdi init when a predictor emits a validity-masked depth map)."""
    depth = np.ones((20, 20), np.float32) * 3.0
    depth[:, 14:] = np.nan  # invalid region (e.g. empty sky)
    depth[:, 7:14] = 3.05  # mild interior variation
    m = np.asarray(depth_gradient_mask(jnp.asarray(depth), 0.3))
    assert m[5, 3] and m[5, 10]  # smooth interior kept
    assert not m[5, 14]  # valid<->invalid boundary masked


def test_lof_detects_outliers(rng):
    cluster = rng.normal(0, 0.1, (300, 3)).astype(np.float32)
    outliers = rng.uniform(3, 5, (10, 3)).astype(np.float32)
    pts = jnp.asarray(np.concatenate([cluster, outliers]))
    scores = np.asarray(lof_scores(pts, k=20))
    mask = np.asarray(lof_inlier_mask(pts, k=20, threshold=1.5))
    assert mask[:300].mean() > 0.95
    assert scores[300:].min() > 1.5
    assert not mask[300:].any()


def _gt_depth_maps(scene):
    """Expected-depth renders of the ground-truth gaussians per camera."""
    from gs_init_tpu.ops.projection import project_gaussians
    from gs_init_tpu.ops.rasterize_ref import rasterize_reference

    n = len(scene.points)
    rngl = np.random.default_rng(0)
    quats = jnp.asarray(rngl.normal(size=(n, 4)), jnp.float32)
    # Use tiny isotropic gaussians at gt points => depth ~ surface depth.
    proj = project_gaussians(
        jnp.asarray(scene.points),
        quats,
        jnp.full((n, 3), 0.05),
        jnp.full((n,), 0.99),
        jnp.asarray(np.linalg.inv(scene.camtoworlds), jnp.float32),
        jnp.asarray(scene.Ks),
        scene.width,
        scene.height,
    )
    colors = jnp.zeros((len(scene.camtoworlds), n, 3))
    _, alpha, depth_acc = rasterize_reference(
        proj, colors, scene.width, scene.height
    )
    ed = np.asarray(depth_acc / jnp.maximum(alpha, 1e-8))
    return ed, np.asarray(alpha)


def test_points_from_depth_recovers_geometry():
    """Distorted oracle depth -> alignment -> unprojection lands near the
    true SfM points."""
    scene = make_scene(n_gaussians=96, n_cams=6, width=80, height=60)
    depths, alphas = _gt_depth_maps(scene)
    ci = 0
    # SfM correspondences: project gt points, keep visible ones.
    vm = np.linalg.inv(scene.camtoworlds[ci])
    pix, z, ok = project_sfm_points(
        jnp.asarray(scene.points),
        jnp.ones(len(scene.points), bool),
        jnp.asarray(vm, jnp.float32),
        jnp.asarray(scene.Ks[ci]),
        scene.width,
        scene.height,
    )
    pred = 0.4 * depths[ci] + 1.7  # affine-distorted "prediction"
    mask = alphas[ci] > 0.5
    out = points_from_depth(
        jnp.asarray(pred, jnp.float32),
        jnp.asarray(mask),
        jnp.asarray(scene.camtoworlds[ci], jnp.float32),
        jnp.asarray(scene.Ks[ci]),
        jnp.asarray(scene.points),
        jnp.ones(len(scene.points), bool),
        jax.random.PRNGKey(0),
        width=scene.width,
        height=scene.height,
        align_method="ransac",
        subsample_method="static",
        subsample_factor=4,
        ransac_iters=300,
    )
    # Alignment must invert the distortion: s ~ 1/0.4, t ~ -1.7/0.4.
    assert float(out.scale) == pytest.approx(2.5, rel=0.1)
    assert float(out.valid_sfm_fraction) > 0.5
    pts = np.asarray(out.pts_world)[np.asarray(out.mask)]
    assert len(pts) > 20
    # Every unprojected point should be near some gt gaussian center
    # (surface sampled from tiny gaussians).
    d = np.linalg.norm(
        pts[:, None, :] - scene.points[None, :, :], axis=-1
    ).min(axis=1)
    assert np.median(d) < 0.15


def test_full_mdi_init_with_runner(tmp_path):
    """Runner end-to-end with init_type=monocular_depth + stub predictor and
    the depth cache."""
    import os

    from gs_init_tpu.engine.runner import Runner
    from tests.test_datasets import _write_colmap_scene

    scene = make_scene(n_gaussians=80, n_cams=8, width=64, height=48)
    data_dir = _write_colmap_scene(tmp_path, scene)
    from gs_init_tpu.config import MonocularDepthInitConfig

    cfg = Config(
        data_dir=data_dir,
        data_factor=1,
        result_dir=str(tmp_path / "results"),
        init_type="monocular_depth",
        max_steps=3,
        eval_steps=[3],
        save_steps=[3],
        test_every=4,
        sh_degree=1,
        max_gaussians=2048,
        pair_capacity=1 << 13,
        rasterizer_impl="xla",
    )
    cfg.mdi.predictor = "stub"
    cfg.mdi.cache_dir = str(tmp_path / "cache")
    cfg.mdi.subsampling.factor = 6
    cfg.mdi.alignment.ransac.max_iterations = 200
    runner = Runner(cfg)
    from gs_init_tpu.engine.params import num_alive

    n0 = int(num_alive(runner.gstate))
    assert n0 > 50
    runner.train_iteration(0)
    # Cache populated; a second init run must hit it.
    cache_files = []
    for root, _, files in os.walk(cfg.mdi.cache_dir):
        cache_files += [f for f in files if f.endswith(".npz")]
    assert len(cache_files) == 6  # train images (8 cams, every 4th is val)

    class Boom:
        name = "stub"

        def predict_depth_batch(self, images, intr):
            raise AssertionError("cache should have been used")

    from gs_init_tpu.mdi.init import pts_and_rgb_from_monocular_depth

    pts, rgbs = pts_and_rgb_from_monocular_depth(cfg, runner.parser, model=Boom())
    assert len(pts) == n0 or len(pts) > 0
