"""Method-adapter integration surface."""
import numpy as np
import pytest

from gs_init_tpu.datasets.synthetic import make_scene
from gs_init_tpu.integration.method import GsInitTpuMethod
from tests.test_datasets import _write_colmap_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    scene = make_scene(n_gaussians=80, n_cams=10, width=64, height=48)
    return _write_colmap_scene(tmp_path_factory.mktemp("m"), scene)


def test_method_lifecycle(scene_dir, tmp_path):
    m = GsInitTpuMethod(
        data_dir=scene_dir,
        config_overrides={
            "data_factor": 1,
            "result_dir": str(tmp_path / "r"),
            "max_steps": 10,
            "test_every": 5,
            "sh_degree": 1,
            "max_gaussians": 128,
            "pair_capacity": 8192,
            "rasterizer_impl": "xla",
            "app_opt": "true",
        },
    )
    info = m.get_info()
    assert info["num_iterations"] == 10
    assert info["num_gaussians"] > 0
    m.setup_train()
    for step in range(3):
        metrics = m.train_iteration(step)
    assert np.isfinite(metrics["loss"])
    ckpt = m.save()
    assert ckpt.endswith(".npz")

    item = m.runner.valset[0]
    out = m.render(item["camtoworld"], item["K"], 64, 48)
    assert out["color"].shape == (48, 64, 3)
    assert out["depth"].shape == (48, 64)

    # Test-time embedding optimization reduces per-view error.
    emb = m.optimize_embedding(
        item["image"], item["camtoworld"], item["K"], n_steps=10
    )
    assert emb.shape == (m.cfg.app_embed_dim,)
    assert np.isfinite(emb).all()

    # Reload from checkpoint.
    m2 = GsInitTpuMethod(
        data_dir=scene_dir,
        checkpoint=ckpt,
        config_overrides={
            "data_factor": 1,
            "result_dir": str(tmp_path / "r2"),
            "max_steps": 10,
            "test_every": 5,
            "sh_degree": 1,
            "max_gaussians": 128,
            "pair_capacity": 8192,
            "rasterizer_impl": "xla",
            "app_opt": "true",
        },
    )
    np.testing.assert_allclose(
        np.asarray(m2.runner.gstate.params.means),
        np.asarray(m.runner.gstate.params.means),
    )


def test_dataset_presets(scene_dir, tmp_path):
    m = GsInitTpuMethod(
        data_dir=scene_dir,
        dataset_kind="blender",
        config_overrides={
            "data_factor": 1,
            "result_dir": str(tmp_path / "r3"),
            "max_steps": 5,
            "test_every": 5,
            "max_gaussians": 128,
            "init_num_pts": 100,
            "pair_capacity": 8192,
            "rasterizer_impl": "xla",
            "sh_degree": 1,
        },
    )
    assert m.cfg.init_type == "random"
    # Reference method_spec.py:34-37: blender trains over a WHITE background.
    assert m.cfg.background_color == (1.0, 1.0, 1.0)
