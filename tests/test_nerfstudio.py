"""Nerfstudio/ScanNet++-format loader."""
import json
import os

import numpy as np
import pytest

from gs_init_tpu.datasets.nerfstudio import NerfstudioParser, open_dataset
from gs_init_tpu.datasets.parser import Dataset, Parser
from gs_init_tpu.datasets.synthetic import make_scene
from tests.test_datasets import _write_colmap_scene

_GL2CV = np.diag([1.0, -1.0, -1.0, 1.0])


@pytest.fixture(scope="module")
def ns_dir(tmp_path_factory):
    """Synthetic scene written as transforms.json + COLMAP points."""
    scene = make_scene(n_gaussians=80, n_cams=10, width=64, height=48)
    # Reuse the COLMAP writer for images + sparse model, add transforms.json.
    data_dir = _write_colmap_scene(tmp_path_factory.mktemp("ns"), scene)
    frames = []
    for i, c2w in enumerate(scene.camtoworlds):
        frames.append(
            {
                "file_path": f"images/img_{i:03d}.png",
                # stored in OpenGL convention, as nerfstudio does
                "transform_matrix": (c2w.astype(np.float64) @ _GL2CV).tolist(),
            }
        )
    meta = {
        "fl_x": float(scene.Ks[0, 0, 0]),
        "fl_y": float(scene.Ks[0, 1, 1]),
        "cx": float(scene.Ks[0, 0, 2]),
        "cy": float(scene.Ks[0, 1, 2]),
        "w": scene.width,
        "h": scene.height,
        "frames": frames,
    }
    with open(os.path.join(data_dir, "transforms.json"), "w") as f:
        json.dump(meta, f)
    return data_dir, scene


def test_nerfstudio_matches_colmap_parser(ns_dir):
    """Same scene through transforms.json and COLMAP must agree."""
    data_dir, scene = ns_dir
    ns = NerfstudioParser(data_dir, normalize=True, test_every=5)
    cm = Parser(data_dir, normalize=True, test_every=5)
    assert ns.num_images == cm.num_images == 10
    assert len(ns.points) == len(cm.points)
    # Identical normalized geometry (same normalization math, same inputs).
    for a, b in zip(ns.images, cm.images):
        assert a.name == b.name
        np.testing.assert_allclose(a.camtoworld, b.camtoworld, atol=1e-5)
        np.testing.assert_allclose(a.K, b.K, atol=1e-4)
    np.testing.assert_allclose(ns.points, cm.points, atol=1e-5)
    # Per-image SfM indices present (from the adjacent COLMAP model).
    assert all(len(v) > 0 for v in ns.point_indices.values())


def test_nerfstudio_dataset_items(ns_dir):
    data_dir, scene = ns_dir
    ns = NerfstudioParser(data_dir, test_every=5)
    ds = Dataset(ns, "train", load_depths=True)
    item = ds[0]
    assert item["image"].shape == (48, 64, 3)
    assert (item["depth_values"] > 0).all()


def test_open_dataset_autodetect(ns_dir, tmp_path_factory):
    data_dir, scene = ns_dir
    assert isinstance(open_dataset(data_dir), NerfstudioParser)
    plain = _write_colmap_scene(tmp_path_factory.mktemp("cm"), scene)
    assert not isinstance(open_dataset(plain), NerfstudioParser)
