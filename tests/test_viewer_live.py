"""Live during-training viewer (reference runner.py:302-309, 880-900):
the HTTP viewer attaches to a running Runner and serves renders of the
current (mutating) parameters between train iterations."""
import json
import urllib.request

import numpy as np

from gs_init_tpu.config import Config, DefaultStrategyConfig
from gs_init_tpu.datasets.synthetic import make_scene
from gs_init_tpu.engine.runner import Runner
from tests.test_datasets import _write_colmap_scene


def _cfg(scene_dir, tmp_path):
    return Config(
        data_dir=scene_dir,
        data_factor=1,
        result_dir=str(tmp_path / "results"),
        max_steps=4,
        eval_steps=[],
        save_steps=[],
        sh_degree=1,
        max_gaussians=128,
        pair_capacity=1 << 12,
        rasterizer_impl="xla",
        tb_every=100,
        disable_viewer=False,
        port=0,  # ephemeral
        strategy=DefaultStrategyConfig(refine_start_iter=10_000),
    )


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=30) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read()


def test_live_viewer_mid_training(tmp_path):
    scene = make_scene(n_gaussians=60, n_cams=6, width=48, height=32)
    scene_dir = _write_colmap_scene(tmp_path / "scene", scene)
    runner = Runner(_cfg(scene_dir, tmp_path))
    port = runner.start_viewer()
    assert port and port > 0

    # Train a couple of steps, then hit the live endpoints mid-training —
    # the server thread renders from whatever params snapshot is current.
    for step in range(2):
        runner.train_step = step
        runner.train_iteration(step)

    status, ctype, body = _get(port, "/status")
    assert status == 200 and "json" in ctype
    st = json.loads(body)
    assert st["step"] == 1 and st["num_GS"] > 0

    status, ctype, body = _get(port, "/render?yaw=0.3&pitch=0.1&w=48&h=32")
    assert status == 200 and ctype == "image/jpeg"
    assert body[:2] == b"\xff\xd8"  # JPEG SOI

    # keep training after serving a view; params keep moving
    before = np.asarray(runner.gstate.params.means).copy()
    for step in range(2, 4):
        runner.train_step = step
        runner.train_iteration(step)
    assert not np.allclose(before, np.asarray(runner.gstate.params.means))

    status, _, body = _get(port, "/")
    assert status == 200 and b"orbit" in body
    runner.viewer.stop()


def test_train_autostarts_viewer(tmp_path):
    scene = make_scene(n_gaussians=60, n_cams=6, width=48, height=32)
    scene_dir = _write_colmap_scene(tmp_path / "scene2", scene)
    runner = Runner(_cfg(scene_dir, tmp_path))
    runner.train()
    assert runner.viewer is not None and runner.viewer.port > 0
    status, _, body = _get(runner.viewer.port, "/status")
    assert status == 200 and json.loads(body)["step"] == 3
    runner.viewer.stop()
