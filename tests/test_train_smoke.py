"""End-to-end smoke training on the synthetic scene: PSNR must improve."""
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
from gs_init_tpu.ops.render import rasterize
from gs_init_tpu.ops.ssim import psnr


def _eval_psnr(cfg, gstate, scene):
    scales, opac = gstate.params.activated()
    render, _, _ = rasterize(
        gstate.params.means,
        gstate.params.quats,
        scales,
        opac,
        gstate.params.sh_coeffs(),
        jnp.linalg.inv(jnp.asarray(scene.camtoworlds)),
        jnp.asarray(scene.Ks),
        scene.width,
        scene.height,
        sh_degree=cfg.sh_degree,
        alive=gstate.alive,
        impl="xla",
    )
    render = jnp.clip(render, 0.0, 1.0)
    return float(psnr(render, jnp.asarray(scene.images)))


def test_training_improves_psnr(rng):
    scene = make_scene(n_gaussians=64, n_cams=8, width=48, height=32)
    cfg = Config(
        max_steps=240,
        sh_degree=1,
        sh_degree_interval=100,
        max_gaussians=256,
        pair_capacity=1 << 14,
        rasterizer_impl="xla",
        strategy=DefaultStrategyConfig(
            refine_start_iter=60, refine_every=60, reset_every=10_000
        ),
    )
    # Init from noisy gt points (mimics an imperfect SfM/depth init).
    pts = scene.points + rng.normal(0, 0.05, scene.points.shape).astype(np.float32)
    rgb = np.clip(
        scene.rgbs + rng.normal(0, 0.1, scene.rgbs.shape), 0, 1
    ).astype(np.float32)
    gstate = init_from_points(
        jnp.asarray(pts), jnp.asarray(rgb), cfg.max_gaussians, cfg.sh_degree
    )
    adam = init_adam_state(gstate.params)
    acfg = make_adam_config(cfg, scene.scene_scale)
    sstate = dstrat.init_state(cfg.max_gaussians)
    aux = AuxParams()
    aux_opt = init_aux_opt(aux)
    step_fn = make_train_step(cfg, acfg, scene.width, scene.height)

    psnr0 = _eval_psnr(cfg, gstate, scene)
    key = jax.random.PRNGKey(0)
    n_alive_before = int(num_alive(gstate))

    refine_jit = jax.jit(dstrat.refine, static_argnames=("scene_scale", "cfg"))
    losses = []
    for step in range(cfg.max_steps):
        key, k1, k2 = jax.random.split(key, 3)
        ci = int(jax.random.randint(k1, (), 0, scene.images.shape[0]))
        batch = Batch(
            camtoworlds=jnp.asarray(scene.camtoworlds[ci : ci + 1]),
            Ks=jnp.asarray(scene.Ks[ci : ci + 1]),
            pixels=jnp.asarray(scene.images[ci : ci + 1]),
            image_ids=jnp.asarray([ci]),
        )
        gstate, adam, sstate, aux, aux_opt, metrics = step_fn(
            gstate, adam, sstate, aux, aux_opt, batch, jnp.int32(step), k2
        )
        losses.append(float(metrics["loss"]))
        s = cfg.strategy
        if (
            s.refine_start_iter < step < s.refine_stop_iter
            and step % s.refine_every == 0
        ):
            key, kr = jax.random.split(key)
            gstate, adam, sstate, stats = refine_jit(
                gstate, adam, sstate, kr, scene.scene_scale, s, jnp.int32(step)
            )

    psnr1 = _eval_psnr(cfg, gstate, scene)
    assert np.mean(losses[-20:]) < np.mean(losses[:20])
    assert psnr1 > psnr0 + 3.0, f"PSNR {psnr0:.2f} -> {psnr1:.2f}"
    assert int(num_alive(gstate)) >= 1
    print(f"\nsmoke train: PSNR {psnr0:.2f} -> {psnr1:.2f}, "
          f"alive {n_alive_before} -> {int(num_alive(gstate))}")


def test_refine_grow_and_prune(rng):
    """Densification mechanics: split/dup allocate slots, prune kills."""
    scene = make_scene(n_gaussians=16, n_cams=4, width=32, height=24)
    cap = 64
    gstate = init_from_points(
        jnp.asarray(scene.points[:16]), jnp.asarray(scene.rgbs[:16]), cap, 1
    )
    adam = init_adam_state(gstate.params)
    scfg = DefaultStrategyConfig()
    sstate = dstrat.init_state(cap)
    # Fake high gradients on the first 8 gaussians.
    sstate = sstate._replace(
        grad2d=jnp.zeros(cap).at[:8].set(1.0), count=jnp.ones(cap)
    )
    g2, adam2, _, stats = dstrat.refine(
        gstate, adam, sstate, jax.random.PRNGKey(0), 1.0, scfg, jnp.int32(1000)
    )
    assert int(stats["n_dup"] + stats["n_split"]) == 8
    assert int(num_alive(g2)) == 16 + 8
    # Opacity pruning: set some opacities very low.
    params = g2.params._replace(
        opacities=g2.params.opacities.at[:4].set(-10.0)
    )
    g3, _, _, stats = dstrat.refine(
        g2._replace(params=params), adam2, dstrat.init_state(cap),
        jax.random.PRNGKey(1), 1.0, scfg, jnp.int32(1000),
    )
    assert int(num_alive(g3)) == 16 + 8 - 4


def test_opacity_reset():
    scene = make_scene(n_gaussians=8, n_cams=2, width=32, height=24)
    gstate = init_from_points(
        jnp.asarray(scene.points[:8]), jnp.asarray(scene.rgbs[:8]), 16, 1
    )
    adam = init_adam_state(gstate.params)
    adam = adam._replace(
        mu=adam.mu._replace(opacities=jnp.ones_like(adam.mu.opacities))
    )
    scfg = DefaultStrategyConfig()
    g2, adam2 = dstrat.reset_opacities(gstate, adam, scfg)
    opa = jax.nn.sigmoid(g2.params.opacities)
    assert float(opa.max()) <= 2 * scfg.prune_opa + 1e-6
    assert float(jnp.abs(adam2.mu.opacities).sum()) == 0.0


def test_absgrad_stats(rng):
    """absgrad densification stats: equal to |net grad| on a single-tile
    image (one pair per gaussian), and >= |net grad| in general."""
    from gs_init_tpu.config import Config, DefaultStrategyConfig

    def run(width, height, absgrad):
        scene = make_scene(n_gaussians=24, n_cams=2, width=width, height=height)
        cfg = Config(
            max_steps=10, sh_degree=1, max_gaussians=32,
            pair_capacity=1 << 12, rasterizer_impl="pallas",
            strategy=DefaultStrategyConfig(absgrad=absgrad),
        )
        gstate = init_from_points(
            jnp.asarray(scene.points[:24]), jnp.asarray(scene.rgbs[:24]), 32, 1
        )
        adam = init_adam_state(gstate.params)
        acfg = make_adam_config(cfg, scene.scene_scale)
        sstate = dstrat.init_state(32)
        aux = AuxParams()
        aux_opt = init_aux_opt(aux)
        step_fn = make_train_step(cfg, acfg, width, height)
        batch = Batch(
            camtoworlds=jnp.asarray(scene.camtoworlds[:1]),
            Ks=jnp.asarray(scene.Ks[:1]),
            pixels=jnp.asarray(scene.images[:1]),
            image_ids=jnp.asarray([0]),
        )
        _, _, sstate, _, _, _ = step_fn(
            gstate, adam, sstate, aux, aux_opt, batch, jnp.int32(0),
            jax.random.PRNGKey(0),
        )
        return np.asarray(sstate.grad2d)

    # Single 16x16 tile: every gaussian has exactly one pair -> |sum| == sum|.|
    g_net = run(16, 16, absgrad=False)
    g_abs = run(16, 16, absgrad=True)
    np.testing.assert_allclose(g_abs, g_net, rtol=1e-4, atol=1e-7)

    # Multi-tile: abs-accumulated magnitude dominates the net gradient.
    g_net = run(64, 48, absgrad=False)
    g_abs = run(64, 48, absgrad=True)
    assert (g_abs >= g_net - 1e-6).all()
    assert g_abs.sum() > g_net.sum()


def test_scale_clamp_quantile():
    """limit_init_scale: kNN distances clamped to the configured quantile
    before the log (reference monocular_depth_init.py:215-224) so isolated
    points can't spawn huge gaussians."""
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 1, (200, 3)).astype(np.float32)
    pts[0] = 100.0  # isolated outlier -> huge kNN distance
    rgbs = rng.uniform(0, 1, (200, 3)).astype(np.float32)
    g_raw = init_from_points(jnp.asarray(pts), jnp.asarray(rgbs), 256)
    g_clamp = init_from_points(
        jnp.asarray(pts), jnp.asarray(rgbs), 256, scale_clamp_quantile=0.9
    )
    s_raw = np.asarray(g_raw.params.scales[:200, 0])
    s_clamp = np.asarray(g_clamp.params.scales[:200, 0])
    assert s_raw[0] > s_clamp[0]  # outlier scale got clamped
    q = np.quantile(np.exp(s_raw), 0.9)
    assert np.exp(s_clamp).max() <= q * (1 + 1e-5)
    # Non-outlier scales below the quantile are untouched.
    inner = np.exp(s_raw) <= q
    np.testing.assert_allclose(s_clamp[inner], s_raw[inner], rtol=1e-6)


def test_train_step_perf_flags(rng):
    """The product train step with reorder_table + sort_bf16 enabled runs
    the pallas path and produces a loss/gradients close to the plain step."""
    from gs_init_tpu.config import Config

    def run(**flags):
        scene = make_scene(n_gaussians=24, n_cams=2, width=64, height=48)
        cfg = Config(
            max_steps=10, sh_degree=1, max_gaussians=32,
            pair_capacity=1 << 12, rasterizer_impl="pallas", **flags,
        )
        gstate = init_from_points(
            jnp.asarray(scene.points[:24]), jnp.asarray(scene.rgbs[:24]), 32, 1
        )
        adam = init_adam_state(gstate.params)
        acfg = make_adam_config(cfg, scene.scene_scale)
        sstate = dstrat.init_state(32)
        aux = AuxParams()
        aux_opt = init_aux_opt(aux)
        step_fn = make_train_step(cfg, acfg, 64, 48)
        batch = Batch(
            camtoworlds=jnp.asarray(scene.camtoworlds[:1]),
            Ks=jnp.asarray(scene.Ks[:1]),
            pixels=jnp.asarray(scene.images[:1]),
            image_ids=jnp.asarray([0]),
        )
        gstate2, *_, metrics = step_fn(
            gstate, adam, sstate, aux, aux_opt, batch, jnp.int32(0),
            jax.random.PRNGKey(0),
        )
        return float(metrics["loss"]), np.asarray(gstate2.params.means)

    l0, m0 = run()
    l1, m1 = run(reorder_table=True, sort_bf16=True)
    assert l0 == l1  # forward identical (flags only touch gather/bwd-sort)
    np.testing.assert_allclose(m1, m0, rtol=0, atol=5e-6)  # post-Adam means


def test_background_color(rng):
    """cfg.background_color composites a fixed background into the train
    render (reference method.py:453-456) and into Runner-style rasterize
    renders; the loss must differ from the no-background step on a scene
    with uncovered pixels."""
    from gs_init_tpu.config import Config
    from gs_init_tpu.ops.render import rasterize

    scene = make_scene(n_gaussians=8, n_cams=2, width=64, height=48)

    def run(bg):
        cfg = Config(
            max_steps=4, sh_degree=1, max_gaussians=16,
            pair_capacity=1 << 12, rasterizer_impl="pallas",
            background_color=bg,
        )
        gstate = init_from_points(
            jnp.asarray(scene.points[:8]), jnp.asarray(scene.rgbs[:8]), 16, 1
        )
        adam = init_adam_state(gstate.params)
        acfg = make_adam_config(cfg, scene.scene_scale)
        sstate = dstrat.init_state(16)
        aux = AuxParams()
        aux_opt = init_aux_opt(aux)
        step_fn = make_train_step(cfg, acfg, 64, 48)
        batch = Batch(
            camtoworlds=jnp.asarray(scene.camtoworlds[:1]),
            Ks=jnp.asarray(scene.Ks[:1]),
            pixels=jnp.asarray(scene.images[:1]),
            image_ids=jnp.asarray([0]),
        )
        *_, metrics = step_fn(
            gstate, adam, sstate, aux, aux_opt, batch, jnp.int32(0),
            jax.random.PRNGKey(0),
        )
        return float(metrics["loss"])

    assert run((1.0, 1.0, 1.0)) != run(None)
    # Uncovered pixels render exactly the background color.
    r, a, _ = rasterize(
        jnp.asarray(scene.points[:8]), jnp.ones((8, 4), jnp.float32),
        jnp.full((8, 3), 0.01, jnp.float32), jnp.full((8,), 0.9, jnp.float32),
        jnp.asarray(scene.rgbs[:8]),
        jnp.linalg.inv(jnp.asarray(scene.camtoworlds[:1])),
        jnp.asarray(scene.Ks[:1]), 64, 48, impl="pallas",
        pair_capacity=1 << 12,
        backgrounds=jnp.asarray([[0.25, 0.5, 0.75]], jnp.float32),
    )
    empty = np.asarray(a[0, ..., 0]) < 1e-6
    assert empty.any()
    np.testing.assert_allclose(
        np.asarray(r)[0][empty], np.tile([[0.25, 0.5, 0.75]], (empty.sum(), 1)),
        atol=1e-6,
    )


def test_refine_scale2d_rules(rng):
    """grow_scale2d splits huge-on-screen gaussians regardless of gradient,
    prune_scale2d prunes them — both only while step <
    refine_scale2d_stop_iter (gsplat default_strategy semantics)."""
    scene = make_scene(n_gaussians=16, n_cams=4, width=32, height=24)
    cap = 64
    gstate = init_from_points(
        jnp.asarray(scene.points[:16]), jnp.asarray(scene.rgbs[:16]), cap, 1
    )
    adam = init_adam_state(gstate.params)
    # prune_scale3d=1e9 silences the 3D too-big rule so only the screen-size
    # rules can fire (kNN-init scales vs scene_scale=1.0 are otherwise big
    # enough to prune everything once step > reset_every).
    scfg = DefaultStrategyConfig(refine_scale2d_stop_iter=4000, prune_scale3d=1e9)
    sstate = dstrat.init_state(cap)
    # No gradient signal at all; only the screen-size rule can fire. Radii
    # are stored normalized by max(W, H): 0.2 > grow_scale2d (0.05) and
    # > prune_scale2d (0.15).
    sstate = sstate._replace(
        count=jnp.ones(cap), radii_max=jnp.zeros(cap).at[:3].set(0.2)
    )
    g2, _, _, stats = dstrat.refine(
        gstate, adam, sstate, jax.random.PRNGKey(0), 1.0, scfg, jnp.int32(3100)
    )
    # The 3 oversized gaussians split (one twin each) AND prune as too-big
    # (step > reset_every = 3000): originals die, twins survive.
    assert int(stats["n_split"]) == 3
    assert int(num_alive(g2)) == 16 + 3 - 3
    # Past refine_scale2d_stop_iter the rule is off; nothing happens.
    g3, _, _, stats3 = dstrat.refine(
        gstate, adam, sstate, jax.random.PRNGKey(0), 1.0, scfg, jnp.int32(4500)
    )
    assert int(stats3["n_split"]) == 0
    assert int(num_alive(g3)) == 16


def test_refine_revised_opacity(rng):
    """revised_opacity: the duplicated copy gets o' = 1 - sqrt(1 - o)."""
    scene = make_scene(n_gaussians=8, n_cams=2, width=32, height=24)
    cap = 32
    gstate = init_from_points(
        jnp.asarray(scene.points[:8]), jnp.asarray(scene.rgbs[:8]), cap, 1
    )
    adam = init_adam_state(gstate.params)
    sstate = dstrat.init_state(cap)
    sstate = sstate._replace(
        grad2d=jnp.zeros(cap).at[:2].set(1.0), count=jnp.ones(cap)
    )
    scfg = DefaultStrategyConfig(revised_opacity=True, grow_scale3d=1e9)
    g2, _, _, stats = dstrat.refine(
        gstate, adam, sstate, jax.random.PRNGKey(0), 1.0, scfg, jnp.int32(1000)
    )
    assert int(stats["n_dup"]) == 2
    o_orig = np.asarray(jax.nn.sigmoid(gstate.params.opacities))[:2]
    # New slots were allocated in the first free (dead) positions.
    alive0 = np.asarray(gstate.alive)
    new_slots = np.where(~alive0)[0][:2]
    o_new = np.asarray(jax.nn.sigmoid(g2.params.opacities))[new_slots]
    np.testing.assert_allclose(o_new, 1.0 - np.sqrt(1.0 - o_orig), rtol=1e-5)
