"""Apple DepthPro predictor — Flax port with HF checkpoint conversion.

Equivalent of the reference predictor (depth_prediction/predictors/
apple_depth_pro.py:29-68): metric depth from a single image using the
intrinsics' focal length, ``f_px = (fx + fy) / 2`` passed to inference.

The network (models/depth_pro.py) follows the HuggingFace
``DepthProForDepthEstimation`` port of apple/ml-depth-pro and loads the
apple/DepthPro-hf checkpoint; conversion is numerically validated against
transformers in tests/test_depth_pro_parity.py. Output semantics match the
HF post-processing: the net emits canonical inverse depth at the network
resolution; metric depth = 1 / clamp(inv * W_orig / f_px, 1e-4, 1e4).
"""
from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from ...models.depth_pro import DepthProNet
from .interface import PredictedDepth

_LOGGER = logging.getLogger(__name__)


def _dinov2_to_flax(sd, put, src, dst, depth):
    """Map an HF Dinov2Model subtree onto a DinoViT module's params."""
    put(f"{dst}/cls_token", sd[f"{src}.embeddings.cls_token"])
    put(f"{dst}/pos_embed", sd[f"{src}.embeddings.position_embeddings"])
    put(
        f"{dst}/patch_embed/kernel",
        sd[f"{src}.embeddings.patch_embeddings.projection.weight"].transpose(
            2, 3, 1, 0
        ),
    )
    put(
        f"{dst}/patch_embed/bias",
        sd[f"{src}.embeddings.patch_embeddings.projection.bias"],
    )
    for i in range(depth):
        b = f"{src}.encoder.layer.{i}"
        fb = f"{dst}/blocks_{i}"
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
        )
        qkv_b = np.concatenate(
            [
                sd[f"{b}.attention.attention.query.bias"],
                sd[f"{b}.attention.attention.key.bias"],
                sd[f"{b}.attention.attention.value.bias"],
            ]
        )
        put(f"{fb}/attn/qkv/kernel", qkv_w.T)
        put(f"{fb}/attn/qkv/bias", qkv_b)
        put(f"{fb}/attn/proj/kernel", sd[f"{b}.attention.output.dense.weight"].T)
        put(f"{fb}/attn/proj/bias", sd[f"{b}.attention.output.dense.bias"])
        put(f"{fb}/mlp/fc1/kernel", sd[f"{b}.mlp.fc1.weight"].T)
        put(f"{fb}/mlp/fc1/bias", sd[f"{b}.mlp.fc1.bias"])
        put(f"{fb}/mlp/fc2/kernel", sd[f"{b}.mlp.fc2.weight"].T)
        put(f"{fb}/mlp/fc2/bias", sd[f"{b}.mlp.fc2.bias"])
        put(f"{fb}/ls1/gamma", sd[f"{b}.layer_scale1.lambda1"])
        put(f"{fb}/ls2/gamma", sd[f"{b}.layer_scale2.lambda1"])
    put(f"{dst}/norm/scale", sd[f"{src}.layernorm.weight"])
    put(f"{dst}/norm/bias", sd[f"{src}.layernorm.bias"])


def convert_depth_pro_checkpoint(state_dict, net: DepthProNet) -> dict:
    """Map an HF DepthProForDepthEstimation state_dict onto DepthProNet."""
    sd = {
        k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for k, v in state_dict.items()
    }
    p = {}

    def put(path, v):
        d = p
        parts = path.split("/")
        for k in parts[:-1]:
            d = d.setdefault(k, {})
        d[parts[-1]] = jnp.asarray(v)

    def conv(dst, src, transpose_conv=False):
        w = sd[f"{src}.weight"]
        if transpose_conv:
            put(f"{dst}/kernel", w.transpose(2, 3, 0, 1)[::-1, ::-1].copy())
        else:
            put(f"{dst}/kernel", w.transpose(2, 3, 1, 0))
        if f"{src}.bias" in sd:
            put(f"{dst}/bias", sd[f"{src}.bias"])

    enc = "depth_pro.encoder"
    _dinov2_to_flax(sd, put, f"{enc}.patch_encoder.model", "patch_encoder",
                    net.vit_depth)
    _dinov2_to_flax(sd, put, f"{enc}.image_encoder.model", "image_encoder",
                    net.vit_depth)

    neck = "depth_pro.neck.feature_upsample"
    conv("up_image/layers_0", f"{neck}.image_block.layers.0",
         transpose_conv=True)
    for i in range(len(net.scaled_images_feature_dims)):
        conv(f"up_scaled_{i}/layers_0", f"{neck}.scaled_images.{i}.layers.0")
        conv(f"up_scaled_{i}/layers_1", f"{neck}.scaled_images.{i}.layers.1",
             transpose_conv=True)
    for i in range(len(net.intermediate_feature_dims)):
        conv(f"up_inter_{i}/layers_0", f"{neck}.intermediate.{i}.layers.0")
        for j in range(2 + i):
            conv(
                f"up_inter_{i}/layers_{j + 1}",
                f"{neck}.intermediate.{i}.layers.{j + 1}",
                transpose_conv=True,
            )
    conv("fuse_image_low", "depth_pro.neck.fuse_image_with_low_res")
    n_proj = len(net.scaled_images_feature_dims) + len(
        net.intermediate_feature_dims
    )
    for i in range(n_proj):
        src = f"depth_pro.neck.feature_projection.projections.{i}"
        if f"{src}.weight" in sd:
            conv(f"proj_{i}", src)

    n_fusion = n_proj
    for i in range(n_fusion - 1):
        fb = f"fusion_stage.intermediate.{i}"
        conv(f"fusion_{i}/rcu1/conv1", f"{fb}.residual_layer1.convolution1")
        conv(f"fusion_{i}/rcu1/conv2", f"{fb}.residual_layer1.convolution2")
        conv(f"fusion_{i}/rcu2/conv1", f"{fb}.residual_layer2.convolution1")
        conv(f"fusion_{i}/rcu2/conv2", f"{fb}.residual_layer2.convolution2")
        conv(f"fusion_{i}/deconv", f"{fb}.deconv", transpose_conv=True)
        conv(f"fusion_{i}/projection", f"{fb}.projection")
    fb = "fusion_stage.final"
    conv("fusion_final/rcu1/conv1", f"{fb}.residual_layer1.convolution1")
    conv("fusion_final/rcu1/conv2", f"{fb}.residual_layer1.convolution2")
    conv("fusion_final/rcu2/conv1", f"{fb}.residual_layer2.convolution1")
    conv("fusion_final/rcu2/conv2", f"{fb}.residual_layer2.convolution2")
    conv("fusion_final/projection", f"{fb}.projection")

    conv("head_0", "head.layers.0")
    conv("head_1", "head.layers.1", transpose_conv=True)
    conv("head_2", "head.layers.2")
    conv("head_4", "head.layers.4")

    if net.use_fov and "fov_model.fov_encoder.neck.weight" in sd:
        _dinov2_to_flax(sd, put, "fov_model.fov_encoder.model", "fov_encoder",
                        net.vit_depth)
        put("fov_neck/kernel", sd["fov_model.fov_encoder.neck.weight"].T)
        put("fov_neck/bias", sd["fov_model.fov_encoder.neck.bias"])
        conv("fov_conv", "fov_model.conv")
        for i in range(net.num_fov_head_layers + 1):
            conv(f"fov_head_{2 * i}", f"fov_model.head.layers.{2 * i}")

    return {"params": p}


def _find_ckpt():
    for d in [
        os.environ.get("GS_TPU_CHECKPOINT_DIR", ""),
        os.path.expanduser("~/.cache/gs_init_tpu"),
        "checkpoints",
    ]:
        if d and os.path.isdir(d):
            for n in sorted(os.listdir(d)):
                if "depth" in n.lower() and "pro" in n.lower():
                    return os.path.join(d, n)
    return None


class AppleDepthProPredictor:
    name = "apple_depth_pro"

    def __init__(
        self,
        checkpoint=None,
        input_size: int = 1536,
        allow_random_weights: bool = False,
        **net_kwargs,
    ):
        self.input_size = input_size
        self.net = DepthProNet(**net_kwargs)
        ckpt = checkpoint or _find_ckpt()
        if ckpt:
            from .depth_anything_v2 import load_checkpoint_file

            sd = load_checkpoint_file(ckpt)
            self.variables = convert_depth_pro_checkpoint(sd, self.net)
            _LOGGER.info("DepthPro weights loaded from %s", ckpt)
        elif allow_random_weights:
            # Smallest valid input: the 0.25x pyramid level must still be
            # one full ViT crop. Parameter shapes are input-size-agnostic.
            s = 4 * self.net.vit_image_size
            dummy = jnp.zeros((1, s, s, 3))
            self.variables = self.net.init(jax.random.PRNGKey(0), dummy)
            _LOGGER.warning(
                "DepthPro running with RANDOM weights (explicitly allowed)"
            )
        else:
            raise FileNotFoundError(
                "No DepthPro checkpoint found. Place the apple/DepthPro-hf "
                "model.safetensors under $GS_TPU_CHECKPOINT_DIR or "
                "~/.cache/gs_init_tpu, or pass allow_random_weights=True."
            )

        @jax.jit
        def _fwd(variables, x):
            return self.net.apply(variables, x)

        self._fwd = _fwd

    def predict_depth_batch(self, images: np.ndarray, intrinsics) -> list:
        b, h, w = images.shape[:3]
        s = self.input_size
        x = jax.image.resize(
            jnp.asarray(images, jnp.float32), (b, s, s, 3), "bilinear"
        )
        x = (x - 0.5) / 0.5
        inv, fov = self._fwd(self.variables, x)

        preds = []
        for i in range(b):
            if intrinsics[i] is not None:
                f_px = 0.5 * (float(intrinsics[i].fx) + float(intrinsics[i].fy))
            elif fov is not None:
                f_px = 0.5 * w / np.tan(0.5 * np.deg2rad(float(fov[i])))
            else:
                f_px = 0.5 * w
            inv_i = jax.image.resize(inv[i], (h, w), "bilinear")
            # HF post_process: metric depth = 1 / clamp(inv * W / f, ...)
            d = 1.0 / np.clip(np.asarray(inv_i) * (w / f_px), 1e-4, 1e4)
            preds.append(
                PredictedDepth(
                    depth=d.astype(np.float32),
                    mask=np.ones_like(d, bool),
                )
            )
        return preds

    def predict_depth(self, image, intrinsics) -> PredictedDepth:
        return self.predict_depth_batch(image[None], [intrinsics])[0]
