"""torch -> Flax weight converter for the MoGe-2 port (models/moge.py).

Consumes a torch state_dict with MoGe-style keys (the reference loads
``Ruicheng/moge-2-<backbone>-normal`` through the MoGe submodule,
depth_prediction/predictors/moge.py:8-33):

  encoder.{cls_token,pos_embed,patch_embed.proj,blocks.N.*,norm.*}
  head.projects.{i}.{weight,bias}        per-level 1x1 projections
  head.upsample.{i}.{weight,bias}        3x3 post-upsample convs
  head.res.{i}.{j}.{conv1,conv2}.*       residual conv blocks
  head.out.0 / head.out.2                output stack (3x3 then 1x1)
  scale_head.0 / scale_head.2            metric-scale MLP on the cls token

Validated end-to-end against a randomly initialized torch assembly of the
same block structure (tests/test_moge_parity.py) — the established
converter-oracle pattern (see metric3d_convert.py). Official release
weights may use different key spellings; this module is the single place
to adjust the mapping.
"""
from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np

from ...models.vit import VIT_CONFIGS


def _to_np(sd: dict) -> dict:
    out = {}
    for k, v in sd.items():
        k = re.sub(r"^(model|module)\.", "", k)
        out[k] = np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v
        )
    return out


def convert_moge_checkpoint(
    state_dict: dict, backbone: str, dim_upsample=(256, 128, 64),
    num_res_blocks: int = 2,
) -> dict:
    """Return {'params': ...} for models.moge.MoGeModel."""
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

    for i in range(4):
        conv(f"head/project_{i}", f"head.projects.{i}")
    for i in range(len(dim_upsample)):
        conv(f"head/upsample_{i}", f"head.upsample.{i}")
        for j in range(num_res_blocks):
            conv(f"head/res_{i}_{j}/conv1", f"head.res.{i}.{j}.conv1")
            conv(f"head/res_{i}_{j}/conv2", f"head.res.{i}.{j}.conv2")
    conv("head/out_conv1", "head.out.0")
    conv("head/out_conv2", "head.out.2")
    linear("scale_head/fc1", "scale_head.0")
    linear("scale_head/fc2", "scale_head.2")
    return {"params": p}


def load_moge_weights(path: str, init_variables: dict, backbone: str):
    """Load + convert a checkpoint file; validates the tree against the
    randomly initialized variables (missing/mismatched arrays raise)."""
    import jax

    from .depth_anything_v2 import load_checkpoint_file

    sd = load_checkpoint_file(path)
    variables = convert_moge_checkpoint(sd, backbone)
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
