"""End-to-end Runner on an on-disk COLMAP scene: train, eval, ckpt, resume."""
import os

import numpy as np
import pytest

from gs_init_tpu.config import Config, DefaultStrategyConfig, MCMCStrategyConfig
from gs_init_tpu.datasets.synthetic import make_scene
from gs_init_tpu.engine.runner import Runner
from tests.test_datasets import _write_colmap_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    scene = make_scene(n_gaussians=80, n_cams=10, width=64, height=48)
    return _write_colmap_scene(tmp_path_factory.mktemp("rd"), scene)


def _cfg(scene_dir, tmp_path, **kw):
    base = dict(
        data_dir=scene_dir,
        data_factor=1,
        result_dir=str(tmp_path / "results"),
        max_steps=40,
        eval_steps=[40],
        save_steps=[40],
        test_every=5,
        sh_degree=1,
        max_gaussians=256,
        pair_capacity=1 << 13,
        rasterizer_impl="xla",
        tb_every=20,
        strategy=DefaultStrategyConfig(
            refine_start_iter=10, refine_every=20, reset_every=10_000
        ),
    )
    base.update(kw)
    return Config(**base)


def test_runner_train_eval_ckpt(scene_dir, tmp_path):
    cfg = _cfg(scene_dir, tmp_path)
    runner = Runner(cfg)
    stats = runner.train()
    assert np.isfinite(stats["loss"])
    # eval artifacts
    eval_json = os.path.join(cfg.result_dir, "stats", "val_step40.json")
    assert os.path.exists(eval_json)
    import json

    st = json.load(open(eval_json))
    assert st["psnr"] > 10.0
    # checkpoint + exact resume
    ckpt = os.path.join(cfg.result_dir, "ckpts", "ckpt_40.npz")
    assert os.path.exists(ckpt)

    runner2 = Runner(_cfg(scene_dir, tmp_path))
    step = runner2.load(ckpt)
    assert step == 40
    np.testing.assert_allclose(
        np.asarray(runner2.gstate.params.means),
        np.asarray(runner.gstate.params.means),
        atol=0,
    )
    # resumed training continues without error
    runner2.train_iteration(41)


def test_runner_render_and_ply(scene_dir, tmp_path):
    cfg = _cfg(scene_dir, tmp_path, max_steps=5, eval_steps=[5], save_steps=[5])
    runner = Runner(cfg)
    runner.train()
    item = runner.valset[0]
    color, alpha, depth = runner.render(
        item["camtoworld"], item["K"], 64, 48, render_mode="RGB+ED"
    )
    assert color.shape == (48, 64, 3) and depth.shape == (48, 64)
    assert np.isfinite(color).all()
    p = runner.export_ply(5)
    from gs_init_tpu.utils.ply import read_ply_splats

    means, *_ = read_ply_splats(p)
    assert len(means) == 64  # sfm init points (scene has 64), no refine in 5 steps
    video = runner.render_traj(5, n_frames=4)
    assert os.path.exists(video) or os.path.exists(
        video.replace(".mp4", "_0000.png")
    )


def test_runner_mcmc(scene_dir, tmp_path):
    cfg = _cfg(
        scene_dir,
        tmp_path,
        strategy=MCMCStrategyConfig(
            cap_max=200, refine_start_iter=5, refine_every=10
        ),
        init_opa=0.5,
        opacity_reg=0.01,
        scale_reg=0.01,
        max_steps=30,
        eval_steps=[30],
        save_steps=[30],
    )
    runner = Runner(cfg)
    stats = runner.train()
    assert np.isfinite(stats["loss"])
    from gs_init_tpu.engine.params import num_alive

    assert int(num_alive(runner.gstate)) <= 200


def test_cli_parsing(scene_dir, tmp_path):
    from gs_init_tpu.trainer import build_presets
    from gs_init_tpu.config import parse_cli

    cfg = parse_cli(
        [
            "mcmc",
            f"--data_dir={scene_dir}",
            "--strategy.cap_max=1234",
            "--mdi.predictor=metric3d",
            "--steps_scaler", "0.5",
            "--max_steps=1000",
            "--eval_steps=[100,500]",
        ],
        build_presets(),
    )
    assert cfg.strategy.cap_max == 1234
    assert cfg.init_opa == 0.5  # mcmc preset
    assert cfg.mdi.predictor == "metric3d"
    assert cfg.eval_steps == [100, 500]
    cfg.adjust_steps()
    assert cfg.max_steps == 500 and cfg.eval_steps == [50, 250]


def test_cli_reference_aliases(scene_dir):
    """Overrides written for the reference CLI work verbatim via the
    alias layer (REFERENCE_ALIASES in config/cli.py)."""
    from gs_init_tpu.trainer import build_presets
    from gs_init_tpu.config import parse_cli

    cfg = parse_cli(
        [
            "default",
            f"--data_dir={scene_dir}",
            "--random_background=true",
            "--save_final_ply=false",
            "--mdi.subsample_factor=7",
            "--mdi.ignore_cache=true",
            "--mdi.depth_grad_mask_thresh=0.05",
            "--mdi.limit_init_scale=true",
            "--mdi.use_num_sfm_points_mask=false",
            "--mdi.alignment.aligner=interp",
            "--mdi.alignment.interp.method=linear",
            "--mdi.alignment.ransac.max_iters=99",
            "--mdi.alignment.segmenter=slic",
            "--mdi.postprocess.outlier_removal=lof",
            "--mdi.depthanything.backbone=vitb",
            "--mdi.noise_std_scene_frac=none",
        ],
        build_presets(),
    )
    assert cfg.random_bkgd is True
    assert cfg.save_ply is False
    assert cfg.mdi.subsampling.method == "static"
    assert cfg.mdi.subsampling.factor == 7
    assert cfg.mdi.use_cache is False
    assert cfg.mdi.depth_gradient_mask is True
    assert cfg.mdi.depth_gradient_threshold == 0.05
    assert cfg.mdi.scale_clamp_quantile == 0.75
    assert cfg.mdi.subsampling.sfm_mask.enabled is False
    assert cfg.mdi.alignment.method == "interpolate"
    assert cfg.mdi.alignment.interp.method == "delaunay"
    assert cfg.mdi.alignment.ransac.max_iterations == 99
    assert cfg.mdi.alignment.segmentation.method == "slic"
    assert cfg.mdi.postprocess.lof_outlier_removal is True
    assert cfg.mdi.backbone == "vitb"
    assert cfg.mdi.noise_frac == 0.0
    # adaptive spelling of the union-typed reference knob
    cfg2 = parse_cli(
        ["default", f"--data_dir={scene_dir}", "--mdi.subsample_factor=adaptive"],
        build_presets(),
    )
    assert cfg2.mdi.subsampling.method == "adaptive"


def test_auto_pair_capacity(scene_dir, tmp_path):
    """The runner shrinks a grossly oversized pair capacity after step 0."""
    cfg = _cfg(
        scene_dir, tmp_path, max_steps=3, eval_steps=[3], save_steps=[3],
        rasterizer_impl="pallas", pair_capacity=1 << 18,
    )
    cfg.auto_pair_capacity = True
    runner = Runner(cfg)
    runner.train_iteration(0)
    assert cfg.pair_capacity <= 1 << 15  # shrunk to a snug power of two
    # Training continues fine with the retuned step.
    m = runner.train_iteration(1)
    assert np.isfinite(m["loss"])
    assert int(m["overflow"]) == 0


def test_patch_size_training(scene_dir, tmp_path):
    """cfg.patch_size random-crops the train batch to static [P, P] shapes
    with a matching principal-point shift (reference colmap.py Dataset
    patch_size path); eval stays full-resolution."""
    cfg = _cfg(
        scene_dir, tmp_path, max_steps=3, eval_steps=[3], save_steps=[3],
        patch_size=16,
    )
    runner = Runner(cfg)
    assert (runner.height, runner.width) == (16, 16)
    item = runner.trainset[0]
    assert item["image"].shape[:2] == (16, 16)
    full = runner.valset[0]["image"].shape[:2]
    assert full != (16, 16)
    m = runner.train_iteration(0)
    assert np.isfinite(m["loss"])
