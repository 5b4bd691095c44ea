"""UniDepth-v2-style camera-aware metric depth model in Flax.

JAX re-implementation of the model behind the reference's UniDepth
predictor (depth_prediction/predictors/unidepth.py:12-51 loads
``lpiccinelli-eth/UniDepth`` v2 via torch.hub and calls
``model.infer(rgb, intrinsics.K)`` — depth is predicted CONDITIONED on the
camera intrinsics, the property that distinguishes UniDepth from the other
predictors). Neither the package nor its checkpoints exist in this
zero-egress environment, so this is a block-level re-implementation of the
published v2 design:

- DINOv2 ViT encoder (shared ``models.vit.DinoViT``), 4 pyramid levels.
- Camera conditioning: dense per-pixel rays from K, encoded with a
  sin/cos Fourier embedding and projected into each pyramid level
  (UniDepth's dense camera-ray prompting); when no K is given, a camera
  head on the class token predicts pinhole intrinsics (v2's self-
  calibration branch).
- Depth decoder: DPT-style fusion over the ray-conditioned features,
  emitting log-depth + confidence (the reference consumes
  depth + confidence, unidepth.py:44-51).

Converter (mdi/predictors/unidepth_convert.py) validated against a
random-weights torch assembly of the same design
(tests/test_unidepth_parity.py), the established oracle pattern.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .vit import VIT_CONFIGS, DinoViT

N_FREQ = 8  # Fourier frequencies for the ray embedding


def ray_embedding(K: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Dense unit rays from intrinsics, Fourier-encoded.

    K: [B, 3, 3]. Returns [B, h, w, 3 + 6*N_FREQ]."""
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None]
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :]
    fx = K[:, 0, 0][:, None, None]
    fy = K[:, 1, 1][:, None, None]
    cx = K[:, 0, 2][:, None, None]
    cy = K[:, 1, 2][:, None, None]
    rx = (xs - cx) / fx
    ry = (ys - cy) / fy
    rx, ry = jnp.broadcast_arrays(rx, ry)
    rz = jnp.ones_like(rx)
    rays = jnp.stack([rx, ry, rz], axis=-1)
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    freqs = 2.0 ** jnp.arange(N_FREQ, dtype=jnp.float32)
    ang = rays[..., None] * freqs * jnp.pi  # [B, h, w, 3, F]
    enc = jnp.concatenate(
        [jnp.sin(ang), jnp.cos(ang)], axis=-1
    ).reshape(rays.shape[:-1] + (6 * N_FREQ,))
    return jnp.concatenate([rays, enc], axis=-1)


class CameraHead(nn.Module):
    """Pinhole intrinsics from the class token (v2 self-calibration)."""

    hidden: int = 256

    @nn.compact
    def __call__(self, cls, width: int, height: int):
        x = nn.Dense(self.hidden, name="fc1")(cls)
        x = nn.relu(x)
        x = nn.Dense(4, name="fc2")(x)  # log fx, log fy, dx, dy
        b = cls.shape[0]
        f = jnp.exp(x[:, :2]) * width
        c = jnp.stack(
            [
                width * (0.5 + 0.1 * jnp.tanh(x[:, 2])),
                height * (0.5 + 0.1 * jnp.tanh(x[:, 3])),
            ],
            axis=-1,
        )
        K = jnp.zeros((b, 3, 3))
        K = K.at[:, 0, 0].set(f[:, 0])
        K = K.at[:, 1, 1].set(f[:, 1])
        K = K.at[:, 0, 2].set(c[:, 0])
        K = K.at[:, 1, 2].set(c[:, 1])
        K = K.at[:, 2, 2].set(1.0)
        return K


class UniDepthModel(nn.Module):
    backbone: str = "vitl"
    features: int = 128
    max_depth: float = 250.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, K: "jnp.ndarray | None" = None):
        """x: [B, H, W, 3] ImageNet-normalized, H/W multiples of 14;
        K: [B, 3, 3] intrinsics in the SAME pixel scale as x (None ->
        predicted by the camera head). Returns dict(depth [B,H,W],
        confidence [B,H,W], K [B,3,3])."""
        b, h, w, _ = x.shape
        cfg = dict(VIT_CONFIGS[self.backbone])
        feats, prefix = DinoViT(
            patch_size=14, num_register_tokens=0, pos_embed_size=37,
            name="encoder", **cfg,
        )(x)
        cls = prefix[-1][:, 0]
        if K is None:
            K = CameraHead(name="camera_head")(cls, w, h)
        ph, pw = h // 14, w // 14
        # Rays are sampled at patch centers: rescale the pixel-space K to
        # the patch grid before ray construction.
        Kp = jnp.concatenate([K[:, :2] / 14.0, K[:, 2:]], axis=1)
        rays = ray_embedding(Kp, ph, pw)

        from .dpt import FeatureFusionBlock, _resize

        fused = []
        for i, f in enumerate(feats):
            y = nn.Conv(self.features, (1, 1), name=f"project_{i}")(f)
            r = nn.Conv(self.features, (1, 1), name=f"ray_proj_{i}")(rays)
            fused.append(y + r)

        # All four ViT levels share the patch resolution; fuse at (ph, pw)
        # and upsample once at the head (v2's decoder is similarly
        # resolution-uniform before the final upsample).
        path = FeatureFusionBlock(self.features, name="refine_3")(
            fused[3], out_hw=(ph, pw)
        )
        path = FeatureFusionBlock(self.features, name="refine_2")(
            path, fused[2], out_hw=(ph, pw)
        )
        path = FeatureFusionBlock(self.features, name="refine_1")(
            path, fused[1], out_hw=(ph, pw)
        )
        path = FeatureFusionBlock(self.features, name="refine_0")(
            path, fused[0], out_hw=(ph * 4, pw * 4)
        )
        y = nn.Conv(self.features // 2, (3, 3), padding=1, name="out_conv1")(path)
        y = nn.relu(y)
        y = nn.Conv(2, (1, 1), name="out_conv2")(y)  # log-depth, conf logit
        y = _resize(y, (h, w))
        depth = jnp.clip(jnp.exp(y[..., 0]), 0.0, self.max_depth)
        conf = jax.nn.sigmoid(y[..., 1])
        return dict(depth=depth, confidence=conf, K=K)
