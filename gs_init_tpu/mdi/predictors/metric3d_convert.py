"""Metric3D v2 torch checkpoint -> Flax parameter conversion.

Maps the official Metric3D-v2 state_dict (DensePredModel: ``encoder`` =
vendored DINOv2-reg ViT with chunked blocks, ``decoder`` =
RAFTDepthNormalDPT5 — reference third_party/metric3d/mono/model/) onto the
Flax modules in models/vit.py + models/raft_dpt.py. Validated numerically
end-to-end against the vendored torch model in
tests/test_metric3d_parity.py (same pattern as the DA-V2 converter,
mdi/predictors/depth_anything_v2.py).

Accepted key spellings: optional ``module.`` / ``model.`` wrappers, optional
``depth_model.`` prefix (BaseDepthModel), ViT blocks as ``blocks.{i}`` or
chunked ``blocks.0.{i}`` (ViT_DINO_reg.py load_ckpt_dino remaps exactly
this way).
"""
from __future__ import annotations

import logging
import re

import jax.numpy as jnp
import numpy as np

from ...models.vit import VIT_CONFIGS

_LOGGER = logging.getLogger(__name__)

BACKBONES = {"small": "vits", "large": "vitl", "giant": "vitg"}


def _normalize_keys(sd: dict) -> dict:
    out = {}
    for k, v in sd.items():
        k = re.sub(r"^(module\.)+", "", k)
        if k.startswith("model."):
            k = k[len("model.") :]
        if k.startswith("depth_model."):
            k = k[len("depth_model.") :]
        # chunked block lists: encoder.blocks.0.{i}. -> encoder.blocks.{i}.
        k = re.sub(r"^encoder\.blocks\.0\.(\d+)\.", r"encoder.blocks.\1.", k)
        out[k] = np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v
        )
    return out


def convert_metric3d_checkpoint(state_dict: dict, backbone: str) -> dict:
    """Return {'params': ...} for Metric3DNet from a torch state_dict."""
    sd = _normalize_keys(state_dict)
    vit = VIT_CONFIGS[BACKBONES[backbone]]
    p = {}

    def put(path, v):
        d = p
        parts = path.split("/")
        for k in parts[:-1]:
            d = d.setdefault(k, {})
        d[parts[-1]] = jnp.asarray(v)

    def linear(dst, src, bias=True):
        put(f"{dst}/kernel", sd[f"{src}.weight"].T)
        if bias and f"{src}.bias" in sd:
            put(f"{dst}/bias", sd[f"{src}.bias"])

    def conv(dst, src, transpose_conv=False):
        w = sd[f"{src}.weight"]
        if transpose_conv:
            # torch ConvTranspose2d IOHW -> flax ConvTranspose HWIO + flip
            # (same transform validated for DA-V2 resize layers).
            put(f"{dst}/kernel", w.transpose(2, 3, 0, 1)[::-1, ::-1].copy())
        else:
            put(f"{dst}/kernel", w.transpose(2, 3, 1, 0))
        if f"{src}.bias" in sd:
            put(f"{dst}/bias", sd[f"{src}.bias"])

    def ln(dst, src):
        put(f"{dst}/scale", sd[f"{src}.weight"])
        put(f"{dst}/bias", sd[f"{src}.bias"])

    # ---- encoder (DINOv2-reg ViT) ----
    enc = "encoder"
    put(f"{enc}/cls_token", sd["encoder.cls_token"])
    put(f"{enc}/pos_embed", sd["encoder.pos_embed"])
    put(f"{enc}/register_tokens", sd["encoder.register_tokens"])
    conv(f"{enc}/patch_embed", "encoder.patch_embed.proj")
    for i in range(vit["depth"]):
        b = f"encoder.blocks.{i}"
        fb = f"{enc}/blocks_{i}"
        ln(f"{fb}/norm1", f"{b}.norm1")
        ln(f"{fb}/norm2", f"{b}.norm2")
        linear(f"{fb}/attn/qkv", f"{b}.attn.qkv")
        linear(f"{fb}/attn/proj", f"{b}.attn.proj")
        linear(f"{fb}/mlp/fc1", f"{b}.mlp.fc1")
        linear(f"{fb}/mlp/fc2", f"{b}.mlp.fc2")
        put(f"{fb}/ls1/gamma", sd[f"{b}.ls1.gamma"])
        put(f"{fb}/ls2/gamma", sd[f"{b}.ls2.gamma"])
    ln(f"{enc}/norm", "encoder.norm")

    # ---- decoder (RAFTDepthNormalDPT5) ----
    dec = "decoder"
    for k in range(4):
        t = f"decoder.token2feature.read_{k}"
        f = f"{dec}/read_{k}/readout"
        linear(f"{f}/project_patch", f"{t}.readoper.project_patch")
        linear(f"{f}/project_learn", f"{t}.readoper.project_learn")
    conv(f"{dec}/read_1/sample", "decoder.token2feature.read_1.sample",
         transpose_conv=True)
    conv(f"{dec}/read_0/sample", "decoder.token2feature.read_0.sample.0")

    for j in (1, 2, 3):
        t = f"decoder.decoder_mono.upconv_{j}"
        f = f"{dec}/upconv_{j}"
        conv(f"{f}/way_trunk/conv1", f"{t}.way_trunk.conv1")
        conv(f"{f}/way_trunk/conv2", f"{t}.way_trunk.conv2")
        if j != 3:  # upconv_3 has fuse=False (no branch)
            conv(f"{f}/way_branch/conv1", f"{t}.way_branch.conv1")
            conv(f"{f}/way_branch/conv2", f"{t}.way_branch.conv2")
        conv(f"{f}/out_conv", f"{t}.out_conv")

    conv(f"{dec}/depth_reg_0", "decoder.depth_regressor.0")
    conv(f"{dec}/depth_reg_2", "decoder.depth_regressor.2")
    for i, idx in zip((0, 2, 4, 6), (0, 2, 4, 6)):
        conv(f"{dec}/normal_{i}", f"decoder.normal_predictor.{idx}")

    # Context encoder: outputs04/08/16 are [hidden_path, context_path],
    # each Sequential(ResidualBlock, Conv) (decoder :494-535).
    for i, lvl in enumerate(("outputs04", "outputs08", "outputs16")):
        for path, name in ((0, "hidden"), (1, "context")):
            t = f"decoder.context_feature_encoder.{lvl}.{path}"
            f = f"{dec}/ctx_{name}_res_{i}"
            conv(f"{f}/conv1", f"{t}.0.conv1")
            conv(f"{f}/conv2", f"{t}.0.conv2")
            ln(f"{f}/norm1", f"{t}.0.norm1")
            ln(f"{f}/norm2", f"{t}.0.norm2")
            if f"{t}.0.downsample.0.weight" in sd:
                conv(f"{f}/downsample", f"{t}.0.downsample.0")
                ln(f"{f}/norm3", f"{t}.0.downsample.1")
            conv(f"{dec}/ctx_{name}_conv_{i}", f"{t}.1")
        conv(f"{dec}/ctx_zqr_{i}", f"decoder.context_zqr_convs.{i}")

    for g in ("gru08", "gru16", "gru32"):
        for c in ("convz", "convr", "convq"):
            conv(f"{dec}/{g}/{c}", f"decoder.update_block.{g}.{c}")
    for c in ("conv1d", "conv2d", "conv1n", "conv2n"):
        conv(f"{dec}/flow_head/{c}", f"decoder.update_block.flow_head.{c}")
    conv(f"{dec}/mask_0", "decoder.update_block.mask.0")
    conv(f"{dec}/mask_2", "decoder.update_block.mask.2")

    return {"params": p}


def load_metric3d_weights(path: str, init_variables: dict, backbone: str):
    """Load + convert a checkpoint file; validates tree structure against
    ``init_variables`` (shapes must match the randomly-initialized net)."""
    import jax

    from .depth_anything_v2 import load_checkpoint_file

    sd = load_checkpoint_file(path)
    if "model_state_dict" in sd:
        sd = sd["model_state_dict"]
    variables = convert_metric3d_checkpoint(sd, backbone)

    ref_paths = {
        "/".join(str(k.key) for k in kp): v.shape
        for kp, v in jax.tree_util.tree_flatten_with_path(init_variables)[0]
    }
    got_paths = {
        "/".join(str(k.key) for k in kp): v.shape
        for kp, v in jax.tree_util.tree_flatten_with_path(variables)[0]
    }
    missing = set(ref_paths) - set(got_paths)
    extra = set(got_paths) - set(ref_paths)
    bad = {
        k: (got_paths[k], ref_paths[k])
        for k in set(ref_paths) & set(got_paths)
        if got_paths[k] != ref_paths[k]
    }
    if missing or extra or bad:
        raise ValueError(
            f"metric3d conversion mismatch: missing={sorted(missing)[:8]} "
            f"extra={sorted(extra)[:8]} shape_mismatch={dict(list(bad.items())[:8])}"
        )
    return variables
