"""torch -> Flax converter for SAM (models/sam.py), keyed on the OFFICIAL
``sam_vit_h_4b8939.pth`` checkpoint layout the reference downloads
(depth_alignment/segmentation/sam.py:23-33). Validated end-to-end against a
random-weights torch assembly of the same design (tests/test_sam_parity.py,
the established converter-oracle pattern)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

SAM_VARIANTS = {
    "vit_b": dict(dim=768, depth=12, num_heads=12,
                  global_attn_indexes=(2, 5, 8, 11)),
    "vit_l": dict(dim=1024, depth=24, num_heads=16,
                  global_attn_indexes=(5, 11, 17, 23)),
    "vit_h": dict(dim=1280, depth=32, num_heads=16,
                  global_attn_indexes=(7, 15, 23, 31)),
}


def _to_np(sd):
    return {
        k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for k, v in sd.items()
    }


def convert_sam_checkpoint(state_dict: dict, variant: str = "vit_h") -> dict:
    sd = _to_np(state_dict)
    cfg = SAM_VARIANTS[variant]
    p = {}

    def put(path, v):
        d = p
        parts = path.split("/")
        for k in parts[:-1]:
            d = d.setdefault(k, {})
        d[parts[-1]] = jnp.asarray(v)

    def linear(dst, src):
        put(f"{dst}/kernel", sd[f"{src}.weight"].T)
        if f"{src}.bias" in sd:
            put(f"{dst}/bias", sd[f"{src}.bias"])

    def conv(dst, src, transpose_conv=False):
        w = sd[f"{src}.weight"]
        if transpose_conv:
            put(f"{dst}/kernel", w.transpose(2, 3, 0, 1)[::-1, ::-1].copy())
        else:
            put(f"{dst}/kernel", w.transpose(2, 3, 1, 0))
        if f"{src}.bias" in sd:
            put(f"{dst}/bias", sd[f"{src}.bias"])

    def ln(dst, src):
        put(f"{dst}/scale", sd[f"{src}.weight"])
        put(f"{dst}/bias", sd[f"{src}.bias"])

    def ln2d(dst, src):
        put(f"{dst}/weight", sd[f"{src}.weight"])
        put(f"{dst}/bias", sd[f"{src}.bias"])

    # ---- image encoder ----
    enc = "image_encoder"
    fe = "encoder"
    # torch pos_embed is [1, g, g, dim] already channel-last.
    put(f"{fe}/pos_embed", sd[f"{enc}.pos_embed"])
    conv(f"{fe}/patch_embed", f"{enc}.patch_embed.proj")
    for i in range(cfg["depth"]):
        b = f"{enc}.blocks.{i}"
        fb = f"{fe}/blocks_{i}"
        ln(f"{fb}/norm1", f"{b}.norm1")
        ln(f"{fb}/norm2", f"{b}.norm2")
        linear(f"{fb}/attn/qkv", f"{b}.attn.qkv")
        linear(f"{fb}/attn/proj", f"{b}.attn.proj")
        put(f"{fb}/attn/rel_pos_h", sd[f"{b}.attn.rel_pos_h"])
        put(f"{fb}/attn/rel_pos_w", sd[f"{b}.attn.rel_pos_w"])
        linear(f"{fb}/mlp_lin1", f"{b}.mlp.lin1")
        linear(f"{fb}/mlp_lin2", f"{b}.mlp.lin2")
    conv(f"{fe}/neck_0", f"{enc}.neck.0")
    ln2d(f"{fe}/neck_1", f"{enc}.neck.1")
    conv(f"{fe}/neck_2", f"{enc}.neck.2")
    ln2d(f"{fe}/neck_3", f"{enc}.neck.3")

    # ---- prompt encoder ----
    pe = "prompt_encoder"
    fp = "prompt"
    put(
        f"{fp}/pe_gaussian",
        sd[f"{pe}.pe_layer.positional_encoding_gaussian_matrix"],
    )
    for i in range(4):
        put(f"{fp}/point_embed_{i}", sd[f"{pe}.point_embeddings.{i}.weight"][0])
    put(f"{fp}/not_a_point_embed", sd[f"{pe}.not_a_point_embed.weight"][0])
    put(f"{fp}/no_mask_embed", sd[f"{pe}.no_mask_embed.weight"][0])

    # ---- mask decoder ----
    md = "mask_decoder"
    fd = "decoder"
    put(f"{fd}/iou_token", sd[f"{md}.iou_token.weight"])
    put(f"{fd}/mask_tokens", sd[f"{md}.mask_tokens.weight"])
    for i in range(2):
        t = f"{md}.transformer.layers.{i}"
        f = f"{fd}/layer_{i}"
        for attn, fattn in (
            ("self_attn", "self_attn"),
            ("cross_attn_token_to_image", "cross_attn_token_to_image"),
            ("cross_attn_image_to_token", "cross_attn_image_to_token"),
        ):
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                linear(f"{f}/{fattn}/{proj}", f"{t}.{attn}.{proj}")
        for n in ("norm1", "norm2", "norm3", "norm4"):
            ln(f"{f}/{n}", f"{t}.{n}")
        linear(f"{f}/mlp_lin1", f"{t}.mlp.lin1")
        linear(f"{f}/mlp_lin2", f"{t}.mlp.lin2")
    for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
        linear(
            f"{fd}/final_attn/{proj}",
            f"{md}.transformer.final_attn_token_to_image.{proj}",
        )
    ln(f"{fd}/norm_final", f"{md}.transformer.norm_final_attn")
    conv(f"{fd}/upscale_0", f"{md}.output_upscaling.0", transpose_conv=True)
    ln2d(f"{fd}/upscale_1", f"{md}.output_upscaling.1")
    conv(f"{fd}/upscale_3", f"{md}.output_upscaling.3", transpose_conv=True)
    for i in range(4):
        for j in range(3):
            linear(
                f"{fd}/hyper_{i}_lin{j}",
                f"{md}.output_hypernetworks_mlps.{i}.layers.{j}",
            )
    for j in range(3):
        linear(f"{fd}/iou_lin{j}", f"{md}.iou_prediction_head.layers.{j}")
    return {"params": p}
