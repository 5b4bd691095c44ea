"""Multi-device sharded training on the virtual 8-CPU mesh."""
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


def _setup(cap=128, width=32, height=24):
    scene = make_scene(n_gaussians=48, n_cams=8, width=width, height=height)
    cfg = Config(
        max_steps=100, sh_degree=1, max_gaussians=cap,
        pair_capacity=1 << 13, rasterizer_impl="xla", batch_size=2,
    )
    gstate = init_from_points(
        jnp.asarray(scene.points), jnp.asarray(scene.rgbs), cap, cfg.sh_degree
    )
    adam = init_adam_state(gstate.params)
    acfg = make_adam_config(cfg, scene.scene_scale)
    return scene, cfg, gstate, adam, acfg


def _batch(scene, idx):
    return Batch(
        camtoworlds=jnp.asarray(scene.camtoworlds[idx]),
        Ks=jnp.asarray(scene.Ks[idx]),
        pixels=jnp.asarray(scene.images[idx]),
        image_ids=jnp.asarray(idx),
    )


@pytest.mark.parametrize("mesh_shape", [(2, 4), (2, 1), (1, 8)])
def test_sharded_step_matches_single_device(mesh_shape):
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    scene, cfg, gstate, adam, acfg = _setup()
    sstate = dstrat.init_state(cfg.max_gaussians)
    idx = np.array([0, 3])
    batch = _batch(scene, idx)
    step = jnp.int32(5)
    key = jax.random.PRNGKey(0)

    # Single-device reference step.
    aux = AuxParams()
    aux_opt = init_aux_opt(aux)
    ref_step = make_train_step(cfg, acfg, scene.width, scene.height)
    g1, a1, s1, _, _, m1 = ref_step(
        gstate, adam, sstate, aux, aux_opt, batch, step, key
    )

    mesh = make_mesh(*mesh_shape)
    sh_step = make_sharded_train_step(cfg, acfg, scene.width, scene.height, mesh)
    gauss_s, data_s, repl_s = shardings(mesh)
    gstate_sh = jax.tree.map(lambda x: jax.device_put(x, gauss_s), gstate)
    adam_sh = jax.tree.map(
        lambda x: jax.device_put(x, gauss_s if x.ndim > 0 else repl_s), adam
    )
    batch_sh = jax.tree.map(lambda x: jax.device_put(x, data_s), batch)
    sstate_sh = jax.tree.map(lambda x: jax.device_put(x, gauss_s), sstate)
    g2, a2, s2, m2 = sh_step(gstate_sh, adam_sh, sstate_sh, batch_sh, step, key)

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5)
    for name in ["means", "scales", "opacities", "sh0"]:
        x1 = np.asarray(getattr(g1.params, name))
        x2 = np.asarray(getattr(g2.params, name))
        np.testing.assert_allclose(
            x2, x1, atol=1e-5, err_msg=f"params.{name} mesh={mesh_shape}"
        )
    np.testing.assert_allclose(
        np.asarray(s2.grad2d), np.asarray(s1.grad2d), atol=1e-5
    )


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
    key = jax.random.PRNGKey(1)
    losses = []
    for step in range(30):
        idx = np.array([step % 8, (step + 4) % 8])
        batch = jax.tree.map(
            lambda x: jax.device_put(x, data_s), _batch(scene, idx)
        )
        gstate, adam, sstate, m = sh_step(
            gstate, adam, sstate, batch, jnp.int32(step), key
        )
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.9


def test_sharded_refine_matches_single_device():
    """Densification (grow/split/prune) on GSPMD-sharded buffers matches the
    single-device result exactly."""
    import jax.numpy as jnp

    from gs_init_tpu.config import DefaultStrategyConfig
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
