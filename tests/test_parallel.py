"""Multi-device sharded training on the virtual 8-CPU mesh.

Every feature of the single-device step (engine/train_step.py) must match
EXACTLY on the sharded path (parallel/shard.py) — params, aux groups and
densification stats — per VERDICT round-1 item #6 (reference DDP modules at
runner.py:227-284 + distributed rasterization semantics).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs_init_tpu.config import Config, DefaultStrategyConfig
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
from gs_init_tpu.parallel.shard import make_mesh, make_sharded_train_step, shardings


def _setup(cap=128, width=32, height=24, **cfg_kw):
    scene = make_scene(n_gaussians=48, n_cams=8, width=width, height=height)
    cfg = Config(
        max_steps=100, sh_degree=1, max_gaussians=cap,
        pair_capacity=1 << 13, rasterizer_impl="xla", batch_size=2,
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


def _make_aux(cfg, scene, key=None):
    from gs_init_tpu.engine.appearance import (
        init_appearance_params,
        init_pose_params,
    )

    key = key if key is not None else jax.random.PRNGKey(11)
    aux = AuxParams()
    n_img = len(scene.camtoworlds)
    if cfg.pose_opt:
        pose = init_pose_params(n_img, std=0.01, key=key)
        aux = aux._replace(pose=pose)
    if cfg.app_opt:
        aux = aux._replace(
            app=init_appearance_params(
                key, n_img, cfg.max_gaussians,
                feature_dim=8, embed_dim=4, sh_degree=cfg.sh_degree,
                mlp_width=16,
            )
        )
    if cfg.use_bilateral_grid:
        aux = aux._replace(
            grids=jnp.tile(
                jnp.eye(3, 4).reshape(1, 1, 1, 1, 12)
                + 0.01 * jax.random.normal(key, (n_img, 2, 4, 4, 12)),
                (1, 1, 1, 1, 1),
            )
        )
    return aux


def _run_pair(cfg_kw, batch_extra=None, mesh_shape=(2, 4), step_val=5):
    """Run single-device vs sharded once; return both full outputs."""
    scene, cfg, gstate, adam, acfg = _setup(**cfg_kw)
    sstate = dstrat.init_state(cfg.max_gaussians)
    idx = np.array([0, 3])
    extra = {}
    if batch_extra:
        extra = batch_extra(scene, idx)
    batch = _batch(scene, idx, **extra)
    step = jnp.int32(step_val)
    key = jax.random.PRNGKey(0)
    aux = _make_aux(cfg, scene)
    aux_opt = init_aux_opt(aux)

    mesh = make_mesh(*mesh_shape)
    sh_step = make_sharded_train_step(cfg, acfg, scene.width, scene.height, mesh)
    gauss_s, data_s, repl_s = shardings(mesh)
    gstate_sh = jax.tree.map(lambda x: jax.device_put(x, gauss_s), gstate)
    adam_sh = jax.tree.map(
        lambda x: jax.device_put(x, gauss_s if x.ndim > 0 else repl_s), adam
    )
    batch_sh = jax.tree.map(lambda x: jax.device_put(x, data_s), batch)
    sstate_sh = jax.tree.map(lambda x: jax.device_put(x, gauss_s), sstate)
    aux_sh = jax.tree.map(lambda x: jax.device_put(x, repl_s), aux)
    aux_opt_sh = jax.tree.map(lambda x: jax.device_put(x, repl_s), aux_opt)

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
    sh = sh_step(
        gstate_sh, adam_sh, sstate_sh, aux_sh, aux_opt_sh, batch_sh, step, key
    )
    return ref, sh


def _assert_match(ref, sh, mesh_shape="", atol=1e-5):
    g1, a1, s1, aux1, _, m1 = ref
    g2, a2, s2, aux2, _, m2 = sh
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5)
    for name in ["means", "scales", "opacities", "sh0"]:
        np.testing.assert_allclose(
            np.asarray(getattr(g2.params, name)),
            np.asarray(getattr(g1.params, name)),
            atol=atol, err_msg=f"params.{name} {mesh_shape}",
        )
    np.testing.assert_allclose(
        np.asarray(s2.grad2d), np.asarray(s1.grad2d), atol=atol
    )
    for leaf1, leaf2 in zip(
        jax.tree_util.tree_leaves(aux1), jax.tree_util.tree_leaves(aux2)
    ):
        np.testing.assert_allclose(
            np.asarray(leaf2), np.asarray(leaf1), atol=atol, err_msg="aux"
        )


@pytest.mark.parametrize("mesh_shape", [(2, 4), (2, 1), (1, 8)])
def test_sharded_step_matches_single_device(mesh_shape):
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    ref, sh = _run_pair({}, mesh_shape=mesh_shape)
    _assert_match(ref, sh, mesh_shape)


def test_sharded_pose_opt_matches():
    ref, sh = _run_pair({"pose_opt": True})
    _assert_match(ref, sh)


def test_sharded_app_opt_matches():
    ref, sh = _run_pair({"app_opt": True})
    _assert_match(ref, sh)


def test_sharded_bilateral_grid_matches():
    ref, sh = _run_pair({"use_bilateral_grid": True})
    _assert_match(ref, sh)


def test_sharded_regs_and_random_bkgd_match():
    ref, sh = _run_pair(
        {"random_bkgd": True, "opacity_reg": 0.01, "scale_reg": 0.01}
    )
    _assert_match(ref, sh)


def test_sharded_background_color_matches():
    ref, sh = _run_pair({"background_color": (1.0, 1.0, 1.0)})
    _assert_match(ref, sh)


def test_sharded_depth_loss_matches():
    def extra(scene, idx):
        rng = np.random.default_rng(0)
        pts = rng.integers(0, [scene.width, scene.height], (len(idx), 6, 2))
        vals = rng.uniform(1.0, 5.0, (len(idx), 6)).astype(np.float32)
        vals[0, 4:] = 0.0  # padding rows
        return dict(
            depth_points=jnp.asarray(pts.astype(np.float32)),
            depth_values=jnp.asarray(vals),
        )

    ref, sh = _run_pair({"depth_loss": True}, batch_extra=extra)
    _assert_match(ref, sh)


def test_sharded_sampling_mask_matches():
    def extra(scene, idx):
        sm = np.zeros((len(idx), scene.height, scene.width, 1), np.float32)
        sm[:, : scene.height // 2] = 1.0
        return dict(sampling_mask=jnp.asarray(sm))

    ref, sh = _run_pair({}, batch_extra=extra)
    _assert_match(ref, sh)


def test_sharded_training_reduces_loss():
    scene, cfg, gstate, adam, acfg = _setup()
    mesh = make_mesh(2, 4)
    sh_step = make_sharded_train_step(cfg, acfg, scene.width, scene.height, mesh)
    gauss_s, data_s, repl_s = shardings(mesh)
    gstate = jax.tree.map(lambda x: jax.device_put(x, gauss_s), gstate)
    adam = jax.tree.map(
        lambda x: jax.device_put(x, gauss_s if x.ndim > 0 else repl_s), adam
    )
    sstate = jax.tree.map(
        lambda x: jax.device_put(x, gauss_s), dstrat.init_state(cfg.max_gaussians)
    )
    aux = AuxParams()
    aux_opt = init_aux_opt(aux)
    key = jax.random.PRNGKey(1)
    losses = []
    for step in range(30):
        idx = np.array([step % 8, (step + 4) % 8])
        batch = jax.tree.map(
            lambda x: jax.device_put(x, data_s), _batch(scene, idx)
        )
        gstate, adam, sstate, aux, aux_opt, m = sh_step(
            gstate, adam, sstate, aux, aux_opt, batch, jnp.int32(step), key
        )
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.9


def test_sharded_refine_matches_single_device():
    """Densification (grow/split/prune) on GSPMD-sharded buffers matches the
    single-device result exactly."""
    from gs_init_tpu.engine.params import num_alive

    scene, cfg, gstate, adam, acfg = _setup()
    scfg = DefaultStrategyConfig()
    sstate = dstrat.init_state(cfg.max_gaussians)
    sstate = sstate._replace(
        grad2d=jnp.zeros(cfg.max_gaussians).at[:16].set(1.0),
        count=jnp.ones(cfg.max_gaussians),
    )
    key = jax.random.PRNGKey(3)
    g1, a1, _, _ = dstrat.refine(
        gstate, adam, sstate, key, 1.0, scfg, jnp.int32(1000)
    )

    mesh = make_mesh(2, 4)
    gauss_s, _, repl_s = shardings(mesh)
    put = lambda x: jax.device_put(x, gauss_s)
    g_sh = jax.tree.map(put, gstate)
    a_sh = jax.tree.map(
        lambda x: jax.device_put(x, gauss_s if x.ndim > 0 else repl_s), adam
    )
    s_sh = jax.tree.map(put, sstate)
    refine_jit = jax.jit(dstrat.refine, static_argnames=("scene_scale", "cfg"))
    g2, a2, _, _ = refine_jit(g_sh, a_sh, s_sh, key, 1.0, scfg, jnp.int32(1000))

    assert int(num_alive(g2)) == int(num_alive(g1))
    np.testing.assert_allclose(
        np.asarray(g2.params.means), np.asarray(g1.params.means), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g2.alive), np.asarray(g1.alive)
    )


def test_sharded_mcmc_relocation_matches_single_device():
    """MCMC relocation + noise on GSPMD-sharded buffers matches
    single-device exactly (sharded-path parity for the MCMC strategy)."""
    from gs_init_tpu.config import MCMCStrategyConfig
    from gs_init_tpu.engine.strategy import mcmc

    scene, cfg, gstate, adam, acfg = _setup()
    scfg = MCMCStrategyConfig(cap_max=128)
    sstate = dstrat.init_state(cfg.max_gaussians)
    key = jax.random.PRNGKey(4)
    g1, a1, _ = mcmc.refine(gstate, adam, sstate, key, scfg)
    g1 = mcmc.add_noise(g1, key, 1e-3, scfg)

    mesh = make_mesh(2, 4)
    gauss_s, _, repl_s = shardings(mesh)
    g_sh = jax.tree.map(lambda x: jax.device_put(x, gauss_s), gstate)
    a_sh = jax.tree.map(
        lambda x: jax.device_put(x, gauss_s if x.ndim > 0 else repl_s), adam
    )
    s_sh = jax.tree.map(lambda x: jax.device_put(x, gauss_s), sstate)
    reloc_jit = jax.jit(mcmc.refine, static_argnames=("cfg",))
    noise_jit = jax.jit(mcmc.add_noise, static_argnames=("cfg",))
    g2, a2, _ = reloc_jit(g_sh, a_sh, s_sh, key, scfg)
    g2 = noise_jit(g2, key, 1e-3, scfg)

    np.testing.assert_allclose(
        np.asarray(g2.params.means), np.asarray(g1.params.means), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g2.params.opacities),
        np.asarray(g1.params.opacities),
        atol=1e-5,
    )


def test_multihost_helpers_single_process():
    """Multi-host wiring (parallel/multihost.py) degenerates correctly to
    the single-process case: initialize is a no-op without a coordinator,
    the global mesh matches make_mesh, and the sharded step runs on it."""
    from gs_init_tpu.parallel.multihost import (
        initialize_multihost,
        local_batch_slice,
        make_global_mesh,
    )

    pid, pcount = initialize_multihost()
    assert (pid, pcount) == (0, 1)
    mesh = make_global_mesh(n_data=2, n_gauss=4)
    assert mesh.shape == {"data": 2, "gauss": 4}
    assert local_batch_slice(8) == slice(0, 8)

    scene, cfg, gstate, adam, acfg = _setup()
    sh_step = make_sharded_train_step(cfg, acfg, scene.width, scene.height, mesh)
    gauss_s, data_s, repl_s = shardings(mesh)
    gstate = jax.tree.map(lambda x: jax.device_put(x, gauss_s), gstate)
    adam = jax.tree.map(
        lambda x: jax.device_put(x, gauss_s if x.ndim > 0 else repl_s), adam
    )
    sstate = jax.tree.map(
        lambda x: jax.device_put(x, gauss_s), dstrat.init_state(cfg.max_gaussians)
    )
    from gs_init_tpu.engine.train_step import AuxParams, init_aux_opt

    aux, aux_opt = AuxParams(), init_aux_opt(AuxParams())
    batch = jax.tree.map(
        lambda x: jax.device_put(x, data_s), _batch(scene, np.array([0, 3]))
    )
    _, _, _, _, _, m = sh_step(
        gstate, adam, sstate, aux, aux_opt, batch, jnp.int32(0),
        jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(m["loss"]))
