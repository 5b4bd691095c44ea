"""Numerical parity of the DA-V2 Flax port vs HuggingFace transformers.

Both implement the official Depth-Anything-V2 architecture; running both
with the SAME random weights validates our port's math (attention,
LayerScale, DPT reassembly/fusion, output head) without needing real
checkpoints (none are fetchable in this environment).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _small_hf_model(dim=64, depth=4, heads=4, fusion=32, grid=6):
    from transformers import DepthAnythingConfig, DepthAnythingForDepthEstimation, Dinov2Config

    bb = Dinov2Config(
        hidden_size=dim,
        num_hidden_layers=depth,
        num_attention_heads=heads,
        intermediate_size=4 * dim,
        patch_size=14,
        image_size=14 * grid,
        layerscale_value=1.0,
        reshape_hidden_states=False,
        out_features=[f"stage{i}" for i in range(1, depth + 1)],
    )
    cfg = DepthAnythingConfig(
        backbone_config=bb,
        fusion_hidden_size=fusion,
        head_hidden_size=32,
        patch_size=14,
        reassemble_hidden_size=dim,
        reassemble_factors=[4, 2, 1, 0.5],
        neck_hidden_sizes=[dim // 4, dim // 2, dim, dim],
        depth_estimation_type="relative",
    )
    torch.manual_seed(0)
    model = DepthAnythingForDepthEstimation(cfg)
    model.eval()
    return model, cfg


def _convert_hf_to_flax(model, dim, depth, fusion, grid, neck_sizes):
    """Map HF DepthAnything weights onto our DinoViT + DPTHead params."""
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    p = {}

    def put(path, v):
        d = p
        parts = path.split("/")
        for k in parts[:-1]:
            d = d.setdefault(k, {})
        d[parts[-1]] = jnp.asarray(v)

    bb = "backbone"
    put("pretrained/cls_token", sd[f"{bb}.embeddings.cls_token"])
    put("pretrained/pos_embed", sd[f"{bb}.embeddings.position_embeddings"])
    put(
        "pretrained/patch_embed/kernel",
        sd[f"{bb}.embeddings.patch_embeddings.projection.weight"].transpose(2, 3, 1, 0),
    )
    put("pretrained/patch_embed/bias", sd[f"{bb}.embeddings.patch_embeddings.projection.bias"])
    for i in range(depth):
        b = f"{bb}.encoder.layer.{i}"
        fb = f"pretrained/blocks_{i}"
        put(f"{fb}/norm1/scale", sd[f"{b}.norm1.weight"])
        put(f"{fb}/norm1/bias", sd[f"{b}.norm1.bias"])
        put(f"{fb}/norm2/scale", sd[f"{b}.norm2.weight"])
        put(f"{fb}/norm2/bias", sd[f"{b}.norm2.bias"])
        q = sd[f"{b}.attention.attention.query.weight"]
        k = sd[f"{b}.attention.attention.key.weight"]
        v = sd[f"{b}.attention.attention.value.weight"]
        put(f"{fb}/attn/qkv/kernel", np.concatenate([q, k, v], 0).T)
        put(
            f"{fb}/attn/qkv/bias",
            np.concatenate(
                [
                    sd[f"{b}.attention.attention.query.bias"],
                    sd[f"{b}.attention.attention.key.bias"],
                    sd[f"{b}.attention.attention.value.bias"],
                ]
            ),
        )
        put(f"{fb}/attn/proj/kernel", sd[f"{b}.attention.output.dense.weight"].T)
        put(f"{fb}/attn/proj/bias", sd[f"{b}.attention.output.dense.bias"])
        put(f"{fb}/mlp/fc1/kernel", sd[f"{b}.mlp.fc1.weight"].T)
        put(f"{fb}/mlp/fc1/bias", sd[f"{b}.mlp.fc1.bias"])
        put(f"{fb}/mlp/fc2/kernel", sd[f"{b}.mlp.fc2.weight"].T)
        put(f"{fb}/mlp/fc2/bias", sd[f"{b}.mlp.fc2.bias"])
        put(f"{fb}/ls1/gamma", sd[f"{b}.layer_scale1.lambda1"])
        put(f"{fb}/ls2/gamma", sd[f"{b}.layer_scale2.lambda1"])
    put("pretrained/norm/scale", sd[f"{bb}.layernorm.weight"])
    put("pretrained/norm/bias", sd[f"{bb}.layernorm.bias"])

    dh = "depth_head"

    def conv(dst, src, transpose_conv=False):
        w = sd[f"{src}.weight"]
        if transpose_conv:
            # torch ConvTranspose2d (IOHW, gradient-based) -> flax
            # ConvTranspose (HWIO, fractionally-strided conv): spatial flip.
            put(f"{dst}/kernel", w.transpose(2, 3, 0, 1)[::-1, ::-1].copy())
        else:
            put(f"{dst}/kernel", w.transpose(2, 3, 1, 0))
        if f"{src}.bias" in sd:
            put(f"{dst}/bias", sd[f"{src}.bias"])

    for i in range(4):
        conv(f"{dh}/project_{i}", f"neck.reassemble_stage.layers.{i}.projection")
    conv(f"{dh}/resize_0", "neck.reassemble_stage.layers.0.resize", transpose_conv=True)
    conv(f"{dh}/resize_1", "neck.reassemble_stage.layers.1.resize", transpose_conv=True)
    conv(f"{dh}/resize_3", "neck.reassemble_stage.layers.3.resize")
    for i in range(4):
        conv(f"{dh}/layer{i + 1}_rn", f"neck.convs.{i}")
    # HF fusion_stage.layers[0] consumes the deepest feature = our refinenet4.
    for i, rf in zip(range(4), [4, 3, 2, 1]):
        hb = f"neck.fusion_stage.layers.{i}"
        fb = f"{dh}/refinenet{rf}"
        if rf != 4:
            conv(f"{fb}/rcu1/conv1", f"{hb}.residual_layer1.convolution1")
            conv(f"{fb}/rcu1/conv2", f"{hb}.residual_layer1.convolution2")
        conv(f"{fb}/rcu2/conv1", f"{hb}.residual_layer2.convolution1")
        conv(f"{fb}/rcu2/conv2", f"{hb}.residual_layer2.convolution2")
        conv(f"{fb}/out_conv", f"{hb}.projection")
    conv(f"{dh}/output_conv1", "head.conv1")
    conv(f"{dh}/output_conv2_0", "head.conv2")
    conv(f"{dh}/output_conv2_2", "head.conv3")
    return {"params": p}


def test_dav2_flax_matches_transformers(rng):
    import flax.linen as nn

    from gs_init_tpu.models.dpt import DPTHead
    from gs_init_tpu.models.vit import DinoViT

    dim, depth, heads, fusion, grid = 64, 4, 4, 32, 6
    model, cfg = _small_hf_model(dim, depth, heads, fusion, grid)

    class SmallNet(nn.Module):
        @nn.compact
        def __call__(self, x):
            feats, _ = DinoViT(
                dim=dim, depth=depth, num_heads=heads,
                out_layers=tuple(range(depth)), pos_embed_size=grid,
                name="pretrained",
            )(x)
            return DPTHead(
                features=fusion,
                out_channels=(dim // 4, dim // 2, dim, dim),
                name="depth_head",
            )(feats, (x.shape[1] // 14, x.shape[2] // 14))

    net = SmallNet()
    variables = _convert_hf_to_flax(
        model, dim, depth, fusion, grid, cfg.neck_hidden_sizes
    )

    img = rng.uniform(-1, 1, (1, 14 * grid, 14 * grid, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(
            pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2))
        ).predicted_depth.numpy()
    got = np.asarray(net.apply(variables, jnp.asarray(img)))

    assert got.shape == ref.shape
    scale = np.abs(ref).max() + 1e-8
    np.testing.assert_allclose(got / scale, ref / scale, atol=2e-3)
