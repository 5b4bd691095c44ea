"""Fast-tier train-step smoke: fresh state -> 2 jitted steps + 1 refine.

This is the regression guard the round-4 incident demanded: a change that
breaks the core `make_train_step` on its FIRST execution (e.g. donated
pytree leaves aliasing one buffer — XLA rejects donating the same buffer
twice) must fail the default `-m "not heavy"` gate, not only the heavy
mesh/parity tier. Mirrors the reference's hot loop entry
(/root/reference/gs_init_compare/runner.py:424-709) at toy scale; runs on
CPU in a few seconds.
"""
import jax
import jax.numpy as jnp
import numpy as np

from gs_init_tpu.config import Config, DefaultStrategyConfig
from gs_init_tpu.datasets.synthetic import make_scene
from gs_init_tpu.engine.optim import init_adam_state, make_adam_config
from gs_init_tpu.engine.params import init_from_points, num_alive
from gs_init_tpu.engine.strategy import default as dstrat
from gs_init_tpu.engine.train_step import (
    AuxParams,
    Batch,
    init_aux_opt,
    make_train_step,
)


def test_fresh_state_two_steps_and_refine():
    scene = make_scene(n_gaussians=32, n_cams=2, width=32, height=24)
    cfg = Config(
        max_steps=100,
        sh_degree=0,
        max_gaussians=64,
        pair_capacity=1 << 10,
        rasterizer_impl="xla",
        strategy=DefaultStrategyConfig(
            refine_start_iter=1, refine_every=1, reset_every=10_000
        ),
    )
    gstate = init_from_points(
        jnp.asarray(scene.points),
        jnp.asarray(scene.rgbs),
        cfg.max_gaussians,
        cfg.sh_degree,
    )
    # Fresh constructors, exactly as bench.py / the Runner build them — the
    # round-4 crash lived in these constructors (aliased zeros buffers), so
    # no pre-warming or copying is allowed here.
    adam = init_adam_state(gstate.params)
    acfg = make_adam_config(cfg, scene.scene_scale)
    sstate = dstrat.init_state(cfg.max_gaussians)
    aux = AuxParams()
    aux_opt = init_aux_opt(aux)
    step_fn = make_train_step(cfg, acfg, scene.width, scene.height)

    batch = Batch(
        camtoworlds=jnp.asarray(scene.camtoworlds[:1]),
        Ks=jnp.asarray(scene.Ks[:1]),
        pixels=jnp.asarray(scene.images[:1]),
        image_ids=jnp.zeros((1,), jnp.int32),
    )
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(2):
        gstate, adam, sstate, aux, aux_opt, metrics = step_fn(
            gstate, adam, sstate, aux, aux_opt, batch, jnp.int32(i), key
        )
        losses.append(float(metrics["loss"]))  # forces execution NOW
    assert np.isfinite(losses).all(), losses

    gstate, adam, sstate, _stats = dstrat.refine(
        gstate, adam, sstate, key, scene.scene_scale, cfg.strategy, jnp.int32(2)
    )
    assert int(num_alive(gstate)) > 0
    # The refined state must feed straight back into the (donating) step.
    gstate, adam, sstate, aux, aux_opt, metrics = step_fn(
        gstate, adam, sstate, aux, aux_opt, batch, jnp.int32(3), key
    )
    assert np.isfinite(float(metrics["loss"]))
