"""Data layer: COLMAP IO round trip, parser, normalization, traj, PLY."""
import os

import numpy as np
import pytest

from gs_init_tpu.datasets import colmap_io as cio
from gs_init_tpu.datasets.normalize import (
    align_principal_axes,
    similarity_from_cameras,
    transform_cameras,
    transform_points,
)
from gs_init_tpu.datasets.parser import Dataset, Parser
from gs_init_tpu.datasets.synthetic import make_scene
from gs_init_tpu.datasets import traj
from gs_init_tpu.utils.ply import (
    read_ply_points,
    read_ply_splats,
    write_ply_points,
    write_ply_splats,
)


def _write_colmap_scene(tmp_path, scene, n_points=64):
    """Materialize a synthetic scene as a COLMAP dataset on disk."""
    from gs_init_tpu.datasets.synthetic import write_colmap_scene

    return write_colmap_scene(str(tmp_path), scene, n_points=n_points)


@pytest.fixture(scope="module")
def colmap_dir(tmp_path_factory):
    scene = make_scene(n_gaussians=80, n_cams=10, width=64, height=48)
    return _write_colmap_scene(tmp_path_factory.mktemp("d"), scene), scene


def test_colmap_roundtrip(colmap_dir):
    data_dir, scene = colmap_dir
    rec = cio.read_reconstruction(os.path.join(data_dir, "sparse/0"))
    assert len(rec.cameras) == 1
    assert len(rec.images) == 10
    assert rec.points_xyz.shape == (64, 3)
    np.testing.assert_allclose(rec.points_xyz, scene.points[:64], atol=1e-6)
    im = rec.images[1]
    assert im.name == "img_000.png"
    # qvec/tvec reproduce the original pose
    w2c = np.linalg.inv(scene.camtoworlds[0])
    np.testing.assert_allclose(cio.qvec_to_rotmat(im.qvec), w2c[:3, :3], atol=1e-6)
    assert (im.point3D_ids >= 1).all()


def test_parser_and_dataset(colmap_dir):
    data_dir, scene = colmap_dir
    parser = Parser(data_dir, factor=1, normalize=True, test_every=5)
    assert parser.num_images == 10
    assert parser.scene_scale > 0
    tr, va = parser.split_indices("train"), parser.split_indices("val")
    assert len(tr) == 8 and len(va) == 2
    assert set(tr) | set(va) == set(range(10))
    # Per-image point indices exist and are in range.
    for name, idx in parser.point_indices.items():
        assert (idx >= 0).all() and (idx < len(parser.points)).all()
        assert len(idx) > 0

    ds = Dataset(parser, "train", load_depths=True)
    item = ds[0]
    assert item["image"].shape == (48, 64, 3)
    assert item["image"].dtype == np.float32
    assert 0.0 <= item["image"].min() and item["image"].max() <= 1.0
    assert item["K"].shape == (3, 3)
    # Depth targets: reprojecting parser points at stored pixels must give
    # the stored depths (consistency of the normalized frame).
    assert len(item["depth_values"]) > 0
    assert (item["depth_values"] > 0).all()


def test_parser_normalization_consistency(colmap_dir):
    """Normalization must preserve relative geometry: reprojection of
    normalized points through normalized cameras matches the original."""
    data_dir, scene = colmap_dir
    p_norm = Parser(data_dir, normalize=True, test_every=100)
    p_raw = Parser(data_dir, normalize=False, test_every=100)

    def reproject(parser, i):
        pim = parser.images[i]
        w2c = np.linalg.inv(pim.camtoworld)
        cam = parser.points @ w2c[:3, :3].T + w2c[:3, 3]
        uv = cam[:, :2] / cam[:, 2:3]
        return uv @ pim.K[:2, :2].T + pim.K[:2, 2]

    np.testing.assert_allclose(
        reproject(p_norm, 0), reproject(p_raw, 0), atol=1e-2
    )


def test_normalize_math(rng):
    c2w = np.stack([np.eye(4)] * 4)
    c2w[:, :3, 3] = rng.normal(0, 5, (4, 3))
    t1 = similarity_from_cameras(c2w)
    c2 = transform_cameras(t1, c2w.copy())
    # Rotations stay orthonormal after the similarity.
    r = c2[0, :3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    pts = rng.normal(0, 2, (100, 3))
    t2 = align_principal_axes(pts)
    pts2 = transform_points(t2, pts)
    cov = np.cov(pts2.T)
    # PCA alignment diagonalizes the covariance.
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < np.abs(np.diag(cov)).max() * 0.05


def test_trajectories(colmap_dir):
    data_dir, scene = colmap_dir
    c2ws = scene.camtoworlds
    for name in ["interp", "ellipse_z", "ellipse_y", "spiral"]:
        path = traj.get_path(name, c2ws, n_frames=30)
        assert path.shape[1:] == (4, 4)
        assert len(path) >= 10
        r = path[:, :3, :3]
        eye = np.einsum("nij,nkj->nik", r, r)
        np.testing.assert_allclose(
            eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5
        )


def test_ply_points_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    rgb = rng.uniform(0, 1, (50, 3)).astype(np.float32)
    p = str(tmp_path / "pc.ply")
    write_ply_points(p, pts, rgb)
    pts2, rgb2 = read_ply_points(p)
    np.testing.assert_allclose(pts2, pts, atol=1e-6)
    np.testing.assert_allclose(rgb2, rgb, atol=1 / 255.0)


def test_ply_splats_roundtrip(tmp_path, rng):
    n = 20
    means = rng.normal(size=(n, 3)).astype(np.float32)
    scales = rng.normal(size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.normal(size=(n,)).astype(np.float32)
    sh0 = rng.normal(size=(n, 1, 3)).astype(np.float32)
    shN = rng.normal(size=(n, 15, 3)).astype(np.float32)
    p = str(tmp_path / "splats.ply")
    write_ply_splats(p, means, scales, quats, opac, sh0, shN)
    m2, s2, q2, o2, sh02, shN2 = read_ply_splats(p)
    for a, b in [(means, m2), (scales, s2), (quats, q2), (opac, o2), (sh0, sh02), (shN, shN2)]:
        np.testing.assert_allclose(b, a, atol=1e-6)


def test_splat_compression_roundtrip(rng):
    """Quantized codec: large size reduction, small reconstruction error."""
    import io

    from gs_init_tpu.utils.compression import compress_splats, decompress_splats

    n = 500
    means = rng.normal(0, 2, (n, 3)).astype(np.float32)
    scales = rng.normal(-4, 0.5, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.normal(0, 2, n).astype(np.float32)
    sh0 = rng.normal(0, 0.5, (n, 1, 3)).astype(np.float32)
    shN = rng.normal(0, 0.05, (n, 15, 3)).astype(np.float32)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "c.npz")
        compress_splats(p, means, scales, quats, opac, sh0, shN)
        size = os.path.getsize(p)
        raw = n * (3 + 3 + 4 + 1 + 3 + 45) * 4
        assert size < raw / 3  # substantial reduction
        m2, s2, q2, o2, sh02, shN2 = decompress_splats(p)
    # Order is permuted (Morton); recover the permutation by nearest match.
    assert m2.shape == means.shape
    from scipy.spatial import cKDTree

    d, idx = cKDTree(means).query(m2)
    assert len(np.unique(idx)) == n  # bijective matching
    assert d.max() < 6e-3  # float16 means
    np.testing.assert_allclose(s2, scales[idx], atol=0.02)
    assert np.abs(o2 - opac[idx]).mean() < 0.02
    np.testing.assert_allclose(shN2, shN[idx], atol=0.01)
