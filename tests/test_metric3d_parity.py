"""Numerical parity of the Metric3D v2 Flax port + checkpoint converter.

Oracle: the vendored torch model from the reference
(third_party/metric3d/mono/model/ — loaded standalone, file-by-file, as a
test fixture only). A randomly-initialized torch DensePredModel
(ViT-small-reg encoder + RAFTDepthNormalDPT5 decoder) is exported through
``convert_metric3d_checkpoint`` and the Flax net must reproduce its
depth/confidence/normal outputs. This proves the name map + every layout
transform end-to-end, which is exactly what loading the official
checkpoint exercises (VERDICT round-1 item #3).
"""
import importlib.util
import math
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_M3D = "/root/reference/gs_init_compare/third_party/metric3d/mono/model"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_M3D), reason="vendored metric3d oracle not available"
)


def _load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def torch_model():
    vit_mod = _load_module(
        "m3d_vit", os.path.join(_M3D, "backbones", "ViT_DINO_reg.py")
    )
    dec_mod = _load_module(
        "m3d_dec",
        os.path.join(_M3D, "decode_heads", "RAFTDepthNormalDPTDecoder5.py"),
    )
    torch.manual_seed(0)
    encoder = vit_mod.vit_small_reg(checkpoint=None)

    ns = types.SimpleNamespace
    cfg = ns(
        model=ns(
            decode_head=ns(
                in_channels=[384, 384, 384, 384],
                feature_channels=[96, 192, 384, 768],
                decoder_channels=[48, 96, 192, 384, 384],
                use_cls_token=True,
                up_scale=7,
                num_register_tokens=4,
                hidden_channels=[48, 48, 48, 48],
                n_gru_layers=3,
                n_downsample=2,
                iters=4,
                slow_fast_gru=True,
            )
        ),
        data_basic=ns(depth_normalize=(0.1, 200.0)),
    )
    decoder = dec_mod.RAFTDepthNormalDPT5(cfg)
    # get_bins() hardcodes device="cuda"; pre-register the anchor on CPU.
    anchor = torch.exp(
        torch.linspace(math.log(0.1), math.log(200.0), 256)
    ).unsqueeze(0)
    decoder.register_buffer("depth_expectation_anchor", anchor, persistent=False)
    encoder.eval()
    decoder.eval()
    # The vendored LoRA layer wrappers have degenerate default inits (huge
    # readout weights, ~0 convs) that cascade to inf/NaN through the random
    # net; re-randomize everything to well-conditioned values — the parity
    # test only needs *some* fixed weights, and small smooth ones are the
    # most numerically sensitive to mapping mistakes.
    g = torch.Generator().manual_seed(7)
    for model in (encoder, decoder):
        for name, prm in model.named_parameters():
            if prm.ndim == 1 and not name.endswith(".bias") and (
                "norm" in name or name.endswith(".gamma")
            ):
                prm.data = 1.0 + 0.1 * torch.randn(prm.shape, generator=g)
            else:
                prm.data = 0.05 * torch.randn(prm.shape, generator=g)
    return encoder, decoder


def test_metric3d_conversion_parity(torch_model):
    encoder, decoder = torch_model

    sd = {}
    for k, v in encoder.state_dict().items():
        sd[f"encoder.{k}"] = v
    for k, v in decoder.state_dict().items():
        sd[f"decoder.{k}"] = v

    torch.manual_seed(1)
    x = torch.randn(1, 3, 112, 112)
    with torch.no_grad():
        out = decoder(encoder(x))
    t_depth = out["prediction"][:, 0].numpy()
    t_conf = out["confidence"][:, 0].numpy()
    t_normal = out["prediction_normal"].permute(0, 2, 3, 1).numpy()

    from gs_init_tpu.mdi.predictors.metric3d import Metric3DNet
    from gs_init_tpu.mdi.predictors.metric3d_convert import (
        convert_metric3d_checkpoint,
    )

    net = Metric3DNet(backbone="small")
    variables = convert_metric3d_checkpoint(sd, "small")
    xin = np.transpose(x.numpy(), (0, 2, 3, 1))
    depth, conf, normal = net.apply(variables, xin)
    depth, conf, normal = np.asarray(depth), np.asarray(conf), np.asarray(normal)

    assert depth.shape == t_depth.shape
    # fp32 CPU both sides; GRU iterations amplify small diffs — allow 1e-3
    # relative to the depth range.
    scale = max(float(np.abs(t_depth).max()), 1.0)
    assert np.max(np.abs(depth - t_depth)) / scale < 1e-3, (
        np.max(np.abs(depth - t_depth)),
        scale,
    )
    cscale = max(float(np.abs(t_conf).max()), 1e-3)
    assert np.max(np.abs(conf - t_conf)) / cscale < 1e-3
    assert np.max(np.abs(normal - t_normal)) < 1e-3


def test_metric3d_loader_validates_tree(torch_model, tmp_path):
    """load_metric3d_weights round-trips through a .pth file and validates
    the converted tree against the Flax init shapes."""
    import jax

    encoder, decoder = torch_model
    sd = {}
    for k, v in encoder.state_dict().items():
        sd[f"depth_model.encoder.{k}"] = v  # full-model prefix spelling
    for k, v in decoder.state_dict().items():
        sd[f"depth_model.decoder.{k}"] = v
    path = tmp_path / "metric_depth_vit_small_test.pth"
    torch.save({"model_state_dict": sd}, path)

    from gs_init_tpu.mdi.predictors.metric3d import Metric3DNet
    from gs_init_tpu.mdi.predictors.metric3d_convert import (
        load_metric3d_weights,
    )

    net = Metric3DNet(backbone="small")
    init_vars = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0), np.zeros((1, 56, 56, 3), np.float32))
    )
    variables = load_metric3d_weights(str(path), init_vars, "small")
    leaves = jax.tree_util.tree_leaves(variables)
    assert leaves and all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
