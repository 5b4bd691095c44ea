"""Numerical parity of the register-token DINOv2 backbone (Metric3D's
encoder) vs transformers' Dinov2WithRegistersModel with shared random
weights — validates cls+register token handling, pos-embed layout and
intermediate-feature extraction for the Metric3D path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_dino_registers_matches_transformers(rng):
    from transformers import Dinov2WithRegistersConfig, Dinov2WithRegistersModel

    from gs_init_tpu.models.vit import DinoViT

    dim, depth, heads, grid, regs = 64, 3, 4, 5, 4
    cfg = Dinov2WithRegistersConfig(
        hidden_size=dim,
        num_hidden_layers=depth,
        num_attention_heads=heads,
        intermediate_size=4 * dim,
        patch_size=14,
        image_size=14 * grid,
        num_register_tokens=regs,
        layerscale_value=1.0,
    )
    torch.manual_seed(0)
    model = Dinov2WithRegistersModel(cfg)
    model.eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    p = {}

    def put(path, v):
        d = p
        parts = path.split("/")
        for k in parts[:-1]:
            d = d.setdefault(k, {})
        d[parts[-1]] = jnp.asarray(v)

    put("cls_token", sd["embeddings.cls_token"])
    put("register_tokens", sd["embeddings.register_tokens"])
    put("pos_embed", sd["embeddings.position_embeddings"])
    put(
        "patch_embed/kernel",
        sd["embeddings.patch_embeddings.projection.weight"].transpose(2, 3, 1, 0),
    )
    put("patch_embed/bias", sd["embeddings.patch_embeddings.projection.bias"])
    for i in range(depth):
        b = f"encoder.layer.{i}"
        fb = f"blocks_{i}"
        put(f"{fb}/norm1/scale", sd[f"{b}.norm1.weight"])
        put(f"{fb}/norm1/bias", sd[f"{b}.norm1.bias"])
        put(f"{fb}/norm2/scale", sd[f"{b}.norm2.weight"])
        put(f"{fb}/norm2/bias", sd[f"{b}.norm2.bias"])
        qkv_w = np.concatenate(
            [
                sd[f"{b}.attention.attention.query.weight"],
                sd[f"{b}.attention.attention.key.weight"],
                sd[f"{b}.attention.attention.value.weight"],
            ],
            0,
        ).T
        qkv_b = np.concatenate(
            [
                sd[f"{b}.attention.attention.query.bias"],
                sd[f"{b}.attention.attention.key.bias"],
                sd[f"{b}.attention.attention.value.bias"],
            ]
        )
        put(f"{fb}/attn/qkv/kernel", qkv_w)
        put(f"{fb}/attn/qkv/bias", qkv_b)
        put(f"{fb}/attn/proj/kernel", sd[f"{b}.attention.output.dense.weight"].T)
        put(f"{fb}/attn/proj/bias", sd[f"{b}.attention.output.dense.bias"])
        put(f"{fb}/mlp/fc1/kernel", sd[f"{b}.mlp.fc1.weight"].T)
        put(f"{fb}/mlp/fc1/bias", sd[f"{b}.mlp.fc1.bias"])
        put(f"{fb}/mlp/fc2/kernel", sd[f"{b}.mlp.fc2.weight"].T)
        put(f"{fb}/mlp/fc2/bias", sd[f"{b}.mlp.fc2.bias"])
        put(f"{fb}/ls1/gamma", sd[f"{b}.layer_scale1.lambda1"])
        put(f"{fb}/ls2/gamma", sd[f"{b}.layer_scale2.lambda1"])
    put("norm/scale", sd["layernorm.weight"])
    put("norm/bias", sd["layernorm.bias"])

    net = DinoViT(
        dim=dim, depth=depth, num_heads=heads,
        out_layers=(depth - 1,), pos_embed_size=grid,
        num_register_tokens=regs,
    )
    img = rng.uniform(-1, 1, (1, 14 * grid, 14 * grid, 3)).astype(np.float32)
    feats, prefixes = net.apply({"params": p}, jnp.asarray(img))

    with torch.no_grad():
        out = model(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    # HF last_hidden_state is final-norm'd: [B, 1 + regs + P, C].
    ref = out.last_hidden_state.numpy()
    got_patches = np.asarray(feats[-1]).reshape(1, grid * grid, dim)
    got_prefix = np.asarray(prefixes[-1])
    scale = np.abs(ref).max()
    np.testing.assert_allclose(
        got_prefix / scale, ref[:, : 1 + regs] / scale, atol=2e-5
    )
    np.testing.assert_allclose(
        got_patches / scale, ref[:, 1 + regs :] / scale, atol=2e-5
    )
