"""torch -> Flax converter for the UniDepth-v2 port (models/unidepth.py).

Key layout (the torch-assembly oracle in tests/test_unidepth_parity.py
uses exactly these names; official release weights may spell keys
differently — this module is the single adjustment point):

  encoder.*                       DINOv2 (same mapping as the MoGe port)
  camera_head.{0,2}.*             intrinsics MLP on the class token
  projects.{i} / ray_projs.{i}    per-level feature / ray-embedding 1x1
  refine.{j}.{rcu1,rcu2}.{conv1,conv2} + refine.{j}.out_conv
  out.0 / out.2                   head convs
"""
from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np

from ...models.vit import VIT_CONFIGS


def _to_np(sd):
    out = {}
    for k, v in sd.items():
        k = re.sub(r"^(model|module)\.", "", k)
        out[k] = np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v
        )
    return out


def convert_unidepth_checkpoint(state_dict: dict, backbone: str) -> dict:
    sd = _to_np(state_dict)
    vit = VIT_CONFIGS[backbone]
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

    def conv(dst, src):
        put(f"{dst}/kernel", sd[f"{src}.weight"].transpose(2, 3, 1, 0))
        if f"{src}.bias" in sd:
            put(f"{dst}/bias", sd[f"{src}.bias"])

    def ln(dst, src):
        put(f"{dst}/scale", sd[f"{src}.weight"])
        put(f"{dst}/bias", sd[f"{src}.bias"])

    enc = "encoder"
    put(f"{enc}/cls_token", sd["encoder.cls_token"])
    put(f"{enc}/pos_embed", sd["encoder.pos_embed"])
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

    if "camera_head.0.weight" in sd:
        linear("camera_head/fc1", "camera_head.0")
        linear("camera_head/fc2", "camera_head.2")
    for i in range(4):
        conv(f"project_{i}", f"projects.{i}")
        conv(f"ray_proj_{i}", f"ray_projs.{i}")
    for j in range(4):
        f = f"refine_{j}"
        t = f"refine.{j}"
        for rcu in ("rcu1", "rcu2"):
            if f"{t}.{rcu}.conv1.weight" in sd:
                conv(f"{f}/{rcu}/conv1", f"{t}.{rcu}.conv1")
                conv(f"{f}/{rcu}/conv2", f"{t}.{rcu}.conv2")
        conv(f"{f}/out_conv", f"{t}.out_conv")
    conv("out_conv1", "out.0")
    conv("out_conv2", "out.2")
    return {"params": p}


def load_unidepth_weights(path: str, init_variables: dict, backbone: str):
    import jax

    from .depth_anything_v2 import load_checkpoint_file

    sd = load_checkpoint_file(path)
    variables = convert_unidepth_checkpoint(sd, backbone)
    ref_leaves = jax.tree_util.tree_leaves_with_path(init_variables)
    got = dict(jax.tree_util.tree_leaves_with_path(variables))
    for key, ref in ref_leaves:
        if key not in got:
            raise KeyError(f"converted checkpoint missing {key}")
        if got[key].shape != ref.shape:
            raise ValueError(
                f"shape mismatch at {key}: {got[key].shape} vs {ref.shape}"
            )
    return variables
