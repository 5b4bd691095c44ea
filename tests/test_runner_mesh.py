"""Product-path multi-device training (VERDICT round-2 item #1).

The Runner itself builds the (data x gauss) mesh from cfg.mesh, places
state, and trains through parallel/shard.py — the TPU equivalent of the
reference's `gsplat.distributed.cli` launch (trainer.py:58) where multi-GPU
training is reachable from the CLI, not only from tests.
"""
import os

import numpy as np
import pytest

import jax

from gs_init_tpu.config import Config
from gs_init_tpu.datasets.synthetic import make_scene
from gs_init_tpu.engine.runner import Runner, resolve_mesh
from tests.test_datasets import _write_colmap_scene


def _cfg(scene_dir, result_dir, mesh, **kw):
    base = dict(
        data_dir=scene_dir,
        result_dir=result_dir,
        data_factor=1,
        max_steps=40,
        batch_size=2,
        sh_degree=1,
        max_gaussians=96,
        pair_capacity=1 << 13,
        rasterizer_impl="xla",
        mesh=mesh,
        eval_steps=[],
        save_steps=[],
        tb_every=1000,
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    scene = make_scene(n_gaussians=60, n_cams=8, width=48, height=32)
    return _write_colmap_scene(tmp_path_factory.mktemp("mesh"), scene)


def test_resolve_mesh():
    cfg = Config(data_dir="", mesh="off")
    assert resolve_mesh(cfg) is None
    cfg = Config(data_dir="", mesh="2x4")
    assert resolve_mesh(cfg) == (2, 4)
    cfg = Config(data_dir="", mesh="auto", batch_size=2)
    n_dev = len(jax.devices())
    got = resolve_mesh(cfg)
    if n_dev > 1:
        assert got == (2, n_dev // 2) if n_dev % 2 == 0 else got
    else:
        assert got is None


def test_runner_mesh_matches_single_device_loss_curve(
    scene_dir, tmp_path_factory
):
    """A CLI-equivalent train on the virtual 8-CPU mesh tracks the
    single-device loss curve through refine boundaries (VERDICT done
    criterion for item #1)."""
    assert len(jax.devices()) >= 8
    r_ref = Runner(
        _cfg(scene_dir, str(tmp_path_factory.mktemp("ref")), "off")
    )
    r_mesh = Runner(
        _cfg(scene_dir, str(tmp_path_factory.mktemp("sh")), "2x4")
    )
    assert r_mesh.mesh is not None and r_mesh.mesh.shape == {
        "data": 2, "gauss": 4,
    }
    # Exercise refine through the product path.
    for r in (r_ref, r_mesh):
        r.cfg.strategy.refine_start_iter = 10
        r.cfg.strategy.refine_every = 15
        r.cfg.strategy.reset_every = 3000

    losses_ref, losses_mesh = [], []
    for step in range(30):
        losses_ref.append(float(r_ref.train_iteration(step)["loss"]))
        losses_mesh.append(float(r_mesh.train_iteration(step)["loss"]))

    np.testing.assert_allclose(
        losses_mesh[:10], losses_ref[:10], rtol=1e-4, atol=1e-5
    )
    # Through the refine boundary the curves stay together.
    assert abs(losses_mesh[-1] - losses_ref[-1]) < 0.05 * max(
        losses_ref[-1], 1e-3
    )
    # Sharded telemetry present (Weak #5): overflow/pairs keys exist.
    m = r_mesh.train_iteration(30)
    assert "overflow" in m and "pairs" in m


def test_runner_mesh_eval_save_load(scene_dir, tmp_path_factory):
    """eval / checkpoint save / mid-train resume all work on sharded state."""
    rdir = str(tmp_path_factory.mktemp("ckpt"))
    r = Runner(_cfg(scene_dir, rdir, "2x4"))
    for step in range(3):
        r.train_iteration(step)
    stats = r.eval(3)
    assert np.isfinite(stats["psnr"])
    path = r.save(3)
    assert os.path.exists(path)

    r2 = Runner(_cfg(scene_dir, str(tmp_path_factory.mktemp("ckpt2")), "2x4"))
    assert r2.load(path) == 3
    np.testing.assert_allclose(
        np.asarray(r2.gstate.params.means),
        np.asarray(r.gstate.params.means),
        atol=1e-6,
    )
    # Resumed training proceeds on the mesh.
    m = r2.train_iteration(4)
    assert np.isfinite(float(m["loss"]))


def test_runner_mesh_mcmc(scene_dir, tmp_path_factory):
    """MCMC strategy end-to-end on the mesh (relocation + noise on sharded
    buffers through the Runner)."""
    from gs_init_tpu.config import MCMCStrategyConfig

    cfg = _cfg(
        scene_dir,
        str(tmp_path_factory.mktemp("mcmc")),
        "2x4",
        strategy=MCMCStrategyConfig(
            cap_max=96, refine_start_iter=2, refine_every=5
        ),
        init_opa=0.5,
        init_scale=0.1,
        opacity_reg=0.01,
        scale_reg=0.01,
    )
    r = Runner(cfg)
    losses = []
    for step in range(12):
        losses.append(float(r.train_iteration(step)["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
