"""Orbax sharded checkpointing: save sharded state, restore, resume."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_orbax_sharded_roundtrip(tmp_path):
    """Gaussian state sharded over a ('data','gauss') mesh survives an orbax
    save/restore with identical values and shardings preserved on save."""
    pytest.importorskip("orbax.checkpoint")
    from gs_init_tpu.config import Config
    from gs_init_tpu.datasets.synthetic import make_scene
    from gs_init_tpu.engine import ckpt as ckpt_mod
    from gs_init_tpu.engine.optim import init_adam_state
    from gs_init_tpu.engine.params import init_from_points
    from gs_init_tpu.engine.strategy import default as dstrat
    from gs_init_tpu.parallel.shard import make_mesh, shardings

    scene = make_scene(n_gaussians=48, n_cams=4, width=32, height=24)
    cap = 64
    gstate = init_from_points(
        jnp.asarray(scene.points), jnp.asarray(scene.rgbs), cap, 1
    )
    adam = init_adam_state(gstate.params)
    sstate = dstrat.init_state(cap)

    mesh = make_mesh(2, 4)
    gauss_s, _, repl_s = shardings(mesh)
    gstate = jax.tree.map(lambda x: jax.device_put(x, gauss_s), gstate)
    adam = jax.tree.map(
        lambda x: jax.device_put(x, gauss_s if x.ndim > 0 else repl_s), adam
    )
    sstate = jax.tree.map(lambda x: jax.device_put(x, gauss_s), sstate)

    class FakeRunner:
        pass

    r = FakeRunner()
    r.cfg = Config(result_dir=str(tmp_path))
    r.gstate, r.adam, r.sstate = gstate, adam, sstate
    import os

    os.makedirs(str(tmp_path / "ckpts"), exist_ok=True)
    path = ckpt_mod.save_orbax(r, 7)

    # Perturb, then restore.
    r.gstate = r.gstate._replace(
        params=r.gstate.params._replace(
            means=r.gstate.params.means * 0.0
        )
    )
    ckpt_mod.load_orbax(r, path)
    np.testing.assert_allclose(
        np.asarray(r.gstate.params.means), np.asarray(gstate.params.means)
    )
    np.testing.assert_allclose(
        np.asarray(r.adam.mu.means), np.asarray(adam.mu.means)
    )
    # Restored arrays carry the original sharding.
    assert r.gstate.params.means.sharding == gauss_s
