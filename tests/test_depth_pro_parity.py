"""Numerical parity of the DepthPro Flax port + HF checkpoint converter.

Oracle: transformers ``DepthProForDepthEstimation`` with a tiny random
config (same role transformers played for the DA-V2 port). Proves the name
map and every layout transform end-to-end — loading apple/DepthPro-hf
exercises exactly this path at the large preset.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_config(use_fov):
    from transformers import DepthProConfig

    vit = dict(
        model_type="dinov2",
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        image_size=56,
        patch_size=14,
        layerscale_value=1.0,
    )
    return DepthProConfig(
        fusion_hidden_size=16,
        patch_size=56,
        use_fov_model=use_fov,
        num_fov_head_layers=2,
        intermediate_hook_ids=[1, 0],
        intermediate_feature_dims=[16, 16],
        scaled_images_ratios=[0.25, 0.5, 1],
        scaled_images_overlap_ratios=[0.0, 0.5, 0.25],
        scaled_images_feature_dims=[32, 32, 16],
        merge_padding_value=3,
        image_model_config=vit,
        patch_model_config=vit,
        fov_model_config=vit,
    )


@pytest.mark.parametrize("use_fov", [False, True])
def test_depth_pro_conversion_parity(use_fov):
    from transformers import DepthProForDepthEstimation

    torch.manual_seed(0)
    model = DepthProForDepthEstimation(_tiny_config(use_fov)).eval()
    # Default HF init gives tiny conv weights; re-randomize for sensitivity.
    g = torch.Generator().manual_seed(7)
    for name, prm in model.named_parameters():
        if prm.ndim == 1 and not name.endswith(".bias") and (
            "norm" in name or "lambda1" in name
        ):
            prm.data = 1.0 + 0.1 * torch.randn(prm.shape, generator=g)
        else:
            prm.data = 0.05 * torch.randn(prm.shape, generator=g)

    torch.manual_seed(1)
    x = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        out = model(x)
    t_depth = out.predicted_depth.numpy()

    from gs_init_tpu.models.depth_pro import DepthProNet
    from gs_init_tpu.mdi.predictors.apple_depth_pro import (
        convert_depth_pro_checkpoint,
    )

    net = DepthProNet(
        vit_dim=32, vit_depth=2, vit_heads=2, vit_image_size=56,
        vit_patch=14, fusion=16,
        intermediate_hook_ids=(1, 0),
        intermediate_feature_dims=(16, 16),
        scaled_images_feature_dims=(32, 32, 16),
        use_fov=use_fov,
    )
    variables = convert_depth_pro_checkpoint(model.state_dict(), net)
    xin = np.transpose(x.numpy(), (0, 2, 3, 1))
    inv, fov = net.apply(variables, xin)
    inv = np.asarray(inv)

    assert inv.shape == t_depth.shape, (inv.shape, t_depth.shape)
    scale = max(float(np.abs(t_depth).max()), 1e-3)
    assert np.max(np.abs(inv - t_depth)) / scale < 1e-3, (
        np.max(np.abs(inv - t_depth)), scale,
    )
    if use_fov:
        t_fov = out.field_of_view.numpy()
        np.testing.assert_allclose(np.asarray(fov), t_fov, atol=1e-4)
    else:
        assert fov is None
