"""Pixel-band-parallel training step (cfg.shard_pixels) on the virtual
8-CPU mesh: exact parity with the single-device step, per feature.

Band parallelism is the multi-chip configuration for the reference's real
operating point (batch_size=1, millions of gaussians,
nerfbaselines_evaluator.py:514-524): the "data" axis shards horizontal
tile-row bands of each image instead of cameras, dividing the dominant
binning+compositing cost that camera data-parallelism cannot touch.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs_init_tpu.config import Config
from gs_init_tpu.datasets.synthetic import make_scene
from gs_init_tpu.engine.optim import init_adam_state, make_adam_config
from gs_init_tpu.engine.params import init_from_points
from gs_init_tpu.engine.strategy import default as dstrat
from gs_init_tpu.engine.train_step import (
    AuxParams,
    Batch,
    init_aux_opt,
    make_train_step,
)
from gs_init_tpu.parallel.shard import (
    make_band_sharded_train_step,
    make_mesh,
    shardings,
)


def _setup(cap=128, width=32, height=48, **cfg_kw):
    # height=48 with tile 16 -> 3 tile rows; data axis 2 or 4 exercises
    # uneven/padded bands.
    scene = make_scene(n_gaussians=48, n_cams=4, width=width, height=height)
    cfg = Config(
        max_steps=100, sh_degree=1, max_gaussians=cap,
        pair_capacity=1 << 13, rasterizer_impl="xla", batch_size=1,
        tile_size=16, shard_pixels=True,
        **cfg_kw,
    )
    gstate = init_from_points(
        jnp.asarray(scene.points), jnp.asarray(scene.rgbs), cap, cfg.sh_degree
    )
    adam = init_adam_state(gstate.params)
    acfg = make_adam_config(cfg, scene.scene_scale)
    return scene, cfg, gstate, adam, acfg


def _batch(scene, idx, **extra):
    return Batch(
        camtoworlds=jnp.asarray(scene.camtoworlds[idx]),
        Ks=jnp.asarray(scene.Ks[idx]),
        pixels=jnp.asarray(scene.images[idx]),
        image_ids=jnp.asarray(idx),
        **extra,
    )


def _run_pair(cfg_kw, batch_extra=None, mesh_shape=(4, 2), step_val=5):
    scene, cfg, gstate, adam, acfg = _setup(**cfg_kw)
    sstate = dstrat.init_state(cfg.max_gaussians)
    idx = np.array([1])
    extra = batch_extra(scene, idx) if batch_extra else {}
    batch = _batch(scene, idx, **extra)
    step = jnp.int32(step_val)
    key = jax.random.PRNGKey(0)
    aux, aux_opt = AuxParams(), init_aux_opt(AuxParams())

    mesh = make_mesh(*mesh_shape)
    band_step = make_band_sharded_train_step(
        cfg, acfg, scene.width, scene.height, mesh
    )
    gauss_s, _, repl_s = shardings(mesh)
    gstate_sh = jax.tree.map(lambda x: jax.device_put(x, gauss_s), gstate)
    adam_sh = jax.tree.map(
        lambda x: jax.device_put(x, gauss_s if x.ndim > 0 else repl_s), adam
    )
    sstate_sh = jax.tree.map(lambda x: jax.device_put(x, gauss_s), sstate)
    batch_sh = jax.tree.map(lambda x: jax.device_put(x, repl_s), batch)

    # The reference step donates its state arguments, and device_put to a
    # multi-device sharding may ALIAS the source buffer for the shard that
    # already sits on the right device — so the donating call must get its
    # own deep copies, or the *_sh trees above die with it.
    _copy = lambda t: jax.tree.map(jnp.copy, t)
    ref_step = make_train_step(cfg, acfg, scene.width, scene.height)
    ref = ref_step(
        _copy(gstate), _copy(adam), _copy(sstate), _copy(aux),
        _copy(aux_opt), batch, step, key,
    )
    sh = band_step(
        gstate_sh, adam_sh, sstate_sh, aux, aux_opt, batch_sh, step, key
    )
    return ref, sh


def _assert_match(ref, sh, atol=1e-5):
    g1, a1, s1, _, _, m1 = ref
    g2, a2, s2, _, _, m2 = sh
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5)
    for name in ["means", "scales", "opacities", "sh0"]:
        np.testing.assert_allclose(
            np.asarray(getattr(g2.params, name)),
            np.asarray(getattr(g1.params, name)),
            atol=atol, err_msg=f"params.{name}",
        )
    np.testing.assert_allclose(
        np.asarray(s2.grad2d), np.asarray(s1.grad2d), atol=atol
    )


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (8, 1), (3, 1)])
def test_band_step_matches_single_device(mesh_shape):
    assert len(jax.devices()) >= 8
    ref, sh = _run_pair({}, mesh_shape=mesh_shape)
    _assert_match(ref, sh)


def test_band_step_regs_and_random_bkgd():
    ref, sh = _run_pair(
        {"random_bkgd": True, "opacity_reg": 0.01, "scale_reg": 0.01}
    )
    _assert_match(ref, sh)


def test_band_step_background_color():
    ref, sh = _run_pair({"background_color": (0.2, 0.4, 0.9)})
    _assert_match(ref, sh)


def test_band_step_depth_loss():
    def extra(scene, idx):
        rng = np.random.default_rng(0)
        pts = rng.integers(0, [scene.width, scene.height], (len(idx), 6, 2))
        vals = rng.uniform(1.0, 5.0, (len(idx), 6)).astype(np.float32)
        vals[0, 4:] = 0.0
        return dict(
            depth_points=jnp.asarray(pts.astype(np.float32)),
            depth_values=jnp.asarray(vals),
        )

    ref, sh = _run_pair({"depth_loss": True}, batch_extra=extra)
    _assert_match(ref, sh)


def test_band_runner_end_to_end(tmp_path):
    """Runner with shard_pixels trains through the band step and tracks the
    single-device loss curve (the product path for the 3M/batch-1 case)."""
    from gs_init_tpu.datasets.synthetic import write_colmap_scene
    from gs_init_tpu.engine.runner import Runner

    scene = make_scene(n_gaussians=60, n_cams=6, width=48, height=32)
    data_dir = write_colmap_scene(str(tmp_path), scene)

    def cfg(mesh, shard_pixels, sub):
        return Config(
            data_dir=data_dir, result_dir=str(tmp_path / sub), data_factor=1,
            max_steps=20, batch_size=1, sh_degree=1, max_gaussians=96,
            pair_capacity=1 << 13, rasterizer_impl="xla", tile_size=16,
            mesh=mesh, shard_pixels=shard_pixels,
            eval_steps=[], save_steps=[], tb_every=1000,
        )

    r_ref = Runner(cfg("off", False, "ref"))
    r_band = Runner(cfg("4x2", True, "band"))
    assert r_band.mesh is not None
    for step in range(12):
        l1 = float(r_ref.train_iteration(step)["loss"])
        l2 = float(r_band.train_iteration(step)["loss"])
        np.testing.assert_allclose(l2, l1, rtol=1e-4, atol=1e-5)
