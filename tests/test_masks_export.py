"""Per-pixel sampling masks + demo export (VERDICT round-1 item #7).

- rasterize(masks=...): masked-out pixels render 0 in every channel
  (reference runner.py:363-364).
- train-step sampling_mask: forward loss may change, but GRADIENTS are
  invariant to corruption of masked-out GT pixels (reference
  method.py:439-443 detach-blend).
- Method.export_demo: viewer-standard splat PLY in the original
  (un-normalized) world frame (reference method.py:867-954).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gs_init_tpu.datasets.synthetic import make_scene
from gs_init_tpu.integration.method import GsInitTpuMethod
from gs_init_tpu.ops.render import rasterize
from tests.test_datasets import _write_colmap_scene


def _toy_gaussians(rng, n=64):
    means = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
    means[:, 2] += 4.0
    quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
    scales = np.exp(rng.normal(-1.5, 0.3, (n, 3))).astype(np.float32)
    opac = (1 / (1 + np.exp(-rng.normal(1, 1, (n,))))).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    viewmats = np.eye(4, dtype=np.float32)[None]
    K = np.array([[[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]]], np.float32)
    return means, quats, scales, opac, colors, viewmats, K


def test_rasterize_masks_zero_pixels(rng):
    means, quats, scales, opac, colors, viewmats, K = _toy_gaussians(rng)
    masks = np.zeros((1, 48, 64), bool)
    masks[:, :24, :] = True
    render, alpha, _ = rasterize(
        means, quats, scales, opac, colors, viewmats, K, 64, 48,
        masks=jnp.asarray(masks), impl="xla",
    )
    r = np.asarray(render)
    assert np.abs(r[0, 24:]).max() == 0.0
    assert np.abs(r[0, :24]).max() > 0.0


def test_sampling_mask_gates_gradients(rng):
    from gs_init_tpu.config import Config
    from gs_init_tpu.engine.optim import init_adam_state, make_adam_config
    from gs_init_tpu.engine.params import init_random
    from gs_init_tpu.engine.strategy import default as dstrat
    from gs_init_tpu.engine.train_step import (
        AuxOptState,
        AuxParams,
        Batch,
        make_train_step,
    )

    # ssim_lambda=0: SSIM windows straddle the mask boundary, so only the
    # L1 term is exactly invariant to masked-GT corruption (true for the
    # reference's fused_ssim under the same detach-gating as well).
    cfg = Config(
        data_dir="", max_gaussians=64, pair_capacity=4096,
        rasterizer_impl="xla", sh_degree=1, ssim_lambda=0.0,
    )
    key = jax.random.PRNGKey(0)
    gstate = init_random(key, 64, 64, extent=1.0, sh_degree=1)
    adam = init_adam_state(gstate.params)
    sstate = dstrat.init_state(64)
    aux, aux_opt = AuxParams(), AuxOptState()
    step_fn = make_train_step(cfg, make_adam_config(cfg, 1.0), 32, 24)

    pixels = rng.uniform(0, 1, (1, 24, 32, 3)).astype(np.float32)
    sm = np.zeros((1, 24, 32, 1), np.float32)
    sm[:, :12] = 1.0
    corrupted = pixels.copy()
    corrupted[0, 12:] = rng.uniform(0, 1, (12, 32, 3))

    c2w = np.eye(4, dtype=np.float32)[None]
    c2w[0, 2, 3] = -4.0
    K = np.array([[[30.0, 0, 16], [0, 30.0, 12], [0, 0, 1]]], np.float32)

    def run(px):
        batch = Batch(
            camtoworlds=jnp.asarray(c2w),
            Ks=jnp.asarray(K),
            pixels=jnp.asarray(px),
            image_ids=jnp.zeros((1,), jnp.int32),
            sampling_mask=jnp.asarray(sm),
        )
        out = step_fn(
            gstate, adam, sstate, aux, aux_opt, batch,
            jnp.int32(0), jax.random.PRNGKey(1),
        )
        return out[0].params.means

    m1 = np.asarray(run(pixels))
    m2 = np.asarray(run(corrupted))
    # L1 grads at masked-out pixels are sign-based and fully stopped by the
    # detach blend, so the parameter update must be bit-identical.
    np.testing.assert_array_equal(m1, m2)


@pytest.fixture(scope="module")
def method(tmp_path_factory):
    scene = make_scene(n_gaussians=60, n_cams=8, width=48, height=32)
    scene_dir = _write_colmap_scene(tmp_path_factory.mktemp("d"), scene)
    return GsInitTpuMethod(
        data_dir=scene_dir,
        config_overrides={
            "data_factor": 1,
            "result_dir": str(tmp_path_factory.mktemp("r")),
            "max_steps": 4,
            "test_every": 4,
            "sh_degree": 1,
            "max_gaussians": 96,
            "pair_capacity": 8192,
            "rasterizer_impl": "xla",
        },
    )


def test_export_demo_app_opt(tmp_path_factory, tmp_path):
    """app_opt export bakes the appearance MLP into SH0 (reference
    method.py:867-954); regression for the round-2 AttributeError on
    AppearanceParams.features."""
    scene = make_scene(n_gaussians=40, n_cams=6, width=48, height=32)
    scene_dir = _write_colmap_scene(tmp_path_factory.mktemp("da"), scene)
    m = GsInitTpuMethod(
        data_dir=scene_dir,
        config_overrides={
            "data_factor": 1,
            "result_dir": str(tmp_path_factory.mktemp("ra")),
            "max_steps": 2,
            "sh_degree": 1,
            "max_gaussians": 64,
            "pair_capacity": 8192,
            "rasterizer_impl": "xla",
            "app_opt": "true",
        },
    )
    from gs_init_tpu.utils.ply import read_ply_splats

    path = m.export_demo(str(tmp_path / "demo_app.ply"))
    means, scales, quats, opac, sh0, shN = read_ply_splats(path)
    n_alive = int(np.asarray(m.runner.gstate.alive).sum())
    assert means.shape == (n_alive, 3)
    assert np.isfinite(sh0).all()
    # Baked export zeroes the view-dependent bands.
    assert np.abs(shN).max() == 0.0


def test_export_demo_roundtrip(method, tmp_path):
    from gs_init_tpu.utils.ply import read_ply_splats

    path = method.export_demo(str(tmp_path / "demo.ply"))
    means, scales, quats, opac, sh0, shN = read_ply_splats(path)
    n_alive = int(np.asarray(method.runner.gstate.alive).sum())
    assert means.shape == (n_alive, 3)
    assert np.isfinite(means).all() and np.isfinite(scales).all()
    np.testing.assert_allclose(
        np.linalg.norm(quats, axis=-1), 1.0, atol=1e-5
    )
    # Means must be in the ORIGINAL world frame: re-applying the parser's
    # normalization transform recovers the training-frame means.
    t = method.runner.parser.transform
    renorm = means @ t[:3, :3].T + t[:3, 3]
    alive = np.asarray(method.runner.gstate.alive)
    np.testing.assert_allclose(
        renorm,
        np.asarray(method.runner.gstate.params.means)[alive],
        atol=1e-4,
    )
