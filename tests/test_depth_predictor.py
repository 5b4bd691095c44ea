"""Depth-Anything-V2 Flax port: shapes, conversion mapping, pipeline hookup."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_vit_shapes(rng):
    from gs_init_tpu.models.vit import DinoViT

    net = DinoViT(dim=64, depth=4, num_heads=4, out_layers=(1, 3),
                  pos_embed_size=37)
    x = jnp.asarray(rng.normal(size=(2, 28, 42, 3)), jnp.float32)
    vars_ = net.init(jax.random.PRNGKey(0), x)
    feats, prefix = net.apply(vars_, x)
    assert len(feats) == 2 and len(prefix) == 2
    assert feats[0].shape == (2, 2, 3, 64)
    assert prefix[0].shape == (2, 1, 64)  # cls token (no registers here)


def test_dav2_forward_shapes(rng):
    from gs_init_tpu.mdi.predictors.depth_anything_v2 import DepthAnythingV2Net

    net = DepthAnythingV2Net(backbone="vits")
    x = jnp.asarray(rng.normal(size=(1, 42, 56, 3)), jnp.float32)
    vars_ = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(vars_, x)
    assert y.shape == (1, 42, 56)
    assert bool(jnp.isfinite(y).all())
    assert float(y.min()) >= 0.0  # relative head ends in relu


def _fake_torch_state_dict(backbone="vits"):
    """Random torch state_dict with the official DA-V2 layout/shapes."""
    import torch

    from gs_init_tpu.models.vit import VIT_CONFIGS
    from gs_init_tpu.models.dpt import DPT_CONFIGS

    v = VIT_CONFIGS[backbone]
    d = DPT_CONFIGS[backbone]
    dim, depth = v["dim"], v["depth"]
    feats, oc = d["features"], d["out_channels"]
    g = torch.Generator().manual_seed(0)
    r = lambda *s: torch.randn(*s, generator=g) * 0.02
    sd = {
        "pretrained.cls_token": r(1, 1, dim),
        "pretrained.pos_embed": r(1, 37 * 37 + 1, dim),
        "pretrained.patch_embed.proj.weight": r(dim, 3, 14, 14),
        "pretrained.patch_embed.proj.bias": r(dim),
        "pretrained.norm.weight": torch.ones(dim),
        "pretrained.norm.bias": torch.zeros(dim),
    }
    for i in range(depth):
        b = f"pretrained.blocks.{i}"
        sd |= {
            f"{b}.norm1.weight": torch.ones(dim),
            f"{b}.norm1.bias": torch.zeros(dim),
            f"{b}.norm2.weight": torch.ones(dim),
            f"{b}.norm2.bias": torch.zeros(dim),
            f"{b}.attn.qkv.weight": r(3 * dim, dim),
            f"{b}.attn.qkv.bias": r(3 * dim),
            f"{b}.attn.proj.weight": r(dim, dim),
            f"{b}.attn.proj.bias": r(dim),
            f"{b}.mlp.fc1.weight": r(4 * dim, dim),
            f"{b}.mlp.fc1.bias": r(4 * dim),
            f"{b}.mlp.fc2.weight": r(dim, 4 * dim),
            f"{b}.mlp.fc2.bias": r(dim),
            f"{b}.ls1.gamma": torch.ones(dim),
            f"{b}.ls2.gamma": torch.ones(dim),
        }
    dh = "depth_head"
    for i in range(4):
        sd |= {
            f"{dh}.projects.{i}.weight": r(oc[i], dim, 1, 1),
            f"{dh}.projects.{i}.bias": r(oc[i]),
            f"{dh}.scratch.layer{i + 1}_rn.weight": r(feats, oc[i], 3, 3),
        }
    sd |= {
        f"{dh}.resize_layers.0.weight": r(oc[0], oc[0], 4, 4),
        f"{dh}.resize_layers.0.bias": r(oc[0]),
        f"{dh}.resize_layers.1.weight": r(oc[1], oc[1], 2, 2),
        f"{dh}.resize_layers.1.bias": r(oc[1]),
        f"{dh}.resize_layers.3.weight": r(oc[3], oc[3], 3, 3),
        f"{dh}.resize_layers.3.bias": r(oc[3]),
    }
    for i in range(1, 5):
        rb = f"{dh}.scratch.refinenet{i}"
        for u in ["resConfUnit1", "resConfUnit2"]:
            sd |= {
                f"{rb}.{u}.conv1.weight": r(feats, feats, 3, 3),
                f"{rb}.{u}.conv1.bias": r(feats),
                f"{rb}.{u}.conv2.weight": r(feats, feats, 3, 3),
                f"{rb}.{u}.conv2.bias": r(feats),
            }
        sd |= {
            f"{rb}.out_conv.weight": r(feats, feats, 1, 1),
            f"{rb}.out_conv.bias": r(feats),
        }
    sd |= {
        f"{dh}.scratch.output_conv1.weight": r(feats // 2, feats, 3, 3),
        f"{dh}.scratch.output_conv1.bias": r(feats // 2),
        f"{dh}.scratch.output_conv2.0.weight": r(32, feats // 2, 3, 3),
        f"{dh}.scratch.output_conv2.0.bias": r(32),
        f"{dh}.scratch.output_conv2.2.weight": r(1, 32, 1, 1),
        f"{dh}.scratch.output_conv2.2.bias": r(1),
    }
    return sd


def test_checkpoint_conversion_applies(rng):
    """The converted param tree must drop into the Flax model exactly
    (structure + shapes validated by flax apply)."""
    pytest.importorskip("torch")
    from gs_init_tpu.mdi.predictors.depth_anything_v2 import (
        DepthAnythingV2Net,
        convert_torch_checkpoint,
    )

    sd = _fake_torch_state_dict("vits")
    variables = convert_torch_checkpoint(sd, "vits")
    net = DepthAnythingV2Net(backbone="vits")
    x = jnp.asarray(rng.normal(size=(1, 28, 28, 3)), jnp.float32)
    ref = net.init(jax.random.PRNGKey(0), x)
    # Same tree structure as a fresh init.
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(ref)
    key = lambda kv: jax.tree_util.keystr(kv[0])
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(variables), key=key),
        sorted(jax.tree_util.tree_leaves_with_path(ref), key=key),
    ):
        assert a.shape == b.shape, (ka, a.shape, b.shape)
    y = net.apply(variables, x)
    assert y.shape == (1, 28, 28) and bool(jnp.isfinite(y).all())


def test_predictor_end_to_end(rng, monkeypatch, caplog):
    """Random-weight predictor produces well-formed PredictedDepth batches."""
    from gs_init_tpu.mdi.predictors.depth_anything_v2 import (
        DepthAnythingV2Predictor,
    )

    monkeypatch.setenv("GS_TPU_CHECKPOINT_DIR", "/nonexistent")
    pred = DepthAnythingV2Predictor(backbone="vits", input_size=56)
    imgs = rng.uniform(0, 1, (2, 40, 60, 3)).astype(np.float32)
    outs = pred.predict_depth_batch(imgs, [None, None])
    assert len(outs) == 2
    for o in outs:
        assert o.depth.shape == (40, 60)
        assert o.mask.shape == (40, 60)
        assert np.isfinite(o.depth[o.mask]).all()


def test_metric3d_forward(rng):
    """Structural: RAFT-DPT decoder produces full-res depth/conf/normals."""
    from gs_init_tpu.mdi.predictors.metric3d import Metric3DPredictor
    from gs_init_tpu.mdi.predictors.interface import CameraIntrinsics

    pred = Metric3DPredictor(backbone="small", allow_random_weights=True)
    imgs = rng.uniform(0, 1, (1, 30, 44, 3)).astype(np.float32)
    intr = [CameraIntrinsics(fx=100.0, fy=100.0, cx=22.0, cy=15.0)]
    outs = pred.predict_depth_batch(imgs, intr)
    o = outs[0]
    assert o.depth.shape == (30, 44)
    assert o.normal.shape == (30, 44, 3)
    assert np.isfinite(o.depth).all()
    assert (o.depth >= 0).all() and (o.depth <= 300).all()
    # normals unit-length
    n = np.linalg.norm(o.normal, axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-3)
