"""MoGe-2 monocular geometry model in Flax (DINOv2 encoder + conv head).

JAX re-implementation of the model behind the reference's MoGe predictor
(depth_prediction/predictors/moge.py:8-33 loads
``Ruicheng/moge-2-<backbone>-normal`` via the MoGe submodule — which is an
empty, un-checked-out submodule in the reference snapshot, .gitmodules:1-9).

Block-level structure follows the published MoGe-2 design:

- DINOv2 ViT encoder (no register tokens), intermediate features from 4
  evenly spaced blocks (shared ``models.vit.DinoViT``).
- Head: per-level 1x1 projections summed into a common width, three
  upsample stages (x2 bilinear + 3x3 conv + residual conv blocks), and a
  final output stack emitting the affine-invariant point map (3), validity
  mask logit (1) and normal (3) at half input resolution (bilinearly
  upsampled to full).
- Metric scale: an MLP on the class token, exponentiated (MoGe-2's metric
  branch; v1 is affine-invariant only).
- Output remap: ``z = exp(z_raw)`` keeps depth positive
  (MoGe ``remap_output='exp'``).

The torch->Flax converter (mdi/predictors/moge_convert.py) is validated
end-to-end against a randomly initialized torch assembly of the same design
(tests/test_moge_parity.py) — the strongest oracle available in this
zero-egress environment, same pattern as the Metric3D/DepthPro ports.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .vit import VIT_CONFIGS, DinoViT


def _resize_bilinear(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(..., mode='bilinear', align_corners=False),
    exactly: half-pixel source mapping, edge clamp, NO antialiasing on
    minification (jax.image.resize antialiases downscales, which diverges
    from the torch head this port mirrors)."""
    b, h, w, c = x.shape
    H, W = hw
    if (H, W) == (h, w):
        return x

    def axis_lerp(arr, size_in, size_out, axis):
        if size_in == 1:
            reps = [1] * arr.ndim
            reps[axis] = size_out
            return jnp.tile(arr, reps)
        pos = (jnp.arange(size_out) + 0.5) * (size_in / size_out) - 0.5
        pos = jnp.clip(pos, 0.0, size_in - 1.0)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, size_in - 2)
        f = (pos - lo).reshape(
            [-1 if i == axis else 1 for i in range(arr.ndim)]
        )
        a = jnp.take(arr, lo, axis=axis)
        b2 = jnp.take(arr, lo + 1, axis=axis)
        return a * (1.0 - f) + b2 * f

    x = axis_lerp(x, h, H, 1)
    return axis_lerp(x, w, W, 2)


class ResidualConvBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.dim, (3, 3), padding=1, name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.dim, (3, 3), padding=1, name="conv2")(y)
        return x + y


class MoGeHead(nn.Module):
    """Projection + 3-stage conv upsampler + split output stack."""

    dim_in: int
    dim_proj: int = 512
    dim_upsample: Sequence[int] = (256, 128, 64)
    num_res_blocks: int = 2
    out_channels: int = 7  # points 3 + mask 1 + normal 3

    @nn.compact
    def __call__(self, feats, out_hw):
        x = None
        for i, f in enumerate(feats):
            p = nn.Conv(self.dim_proj, (1, 1), name=f"project_{i}")(f)
            x = p if x is None else x + p
        for i, dim in enumerate(self.dim_upsample):
            b, h, w, _ = x.shape
            x = _resize_bilinear(x, (h * 2, w * 2))
            x = nn.Conv(dim, (3, 3), padding=1, name=f"upsample_{i}")(x)
            for j in range(self.num_res_blocks):
                x = ResidualConvBlock(dim, name=f"res_{i}_{j}")(x)
        x = _resize_bilinear(x, out_hw)
        x = nn.Conv(self.dim_upsample[-1], (3, 3), padding=1, name="out_conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), name="out_conv2")(x)
        return x


class ScaleHead(nn.Module):
    """Metric scale from the class token (MoGe-2 metric branch)."""

    hidden: int = 512

    @nn.compact
    def __call__(self, cls):
        x = nn.Dense(self.hidden, name="fc1")(cls)
        x = nn.relu(x)
        x = nn.Dense(1, name="fc2")(x)
        return jnp.exp(x[..., 0])


class MoGeModel(nn.Module):
    backbone: str = "vitl"
    dim_proj: int = 512
    dim_upsample: Sequence[int] = (256, 128, 64)
    num_res_blocks: int = 2
    scale_hidden: int = 512

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: [B, H, W, 3] ImageNet-normalized; H, W multiples of 14.

        Returns dict(points [B,H,W,3] metric, depth [B,H,W], mask_logit
        [B,H,W], normal [B,H,W,3] unit, scale [B])."""
        b, h, w, _ = x.shape
        cfg = dict(VIT_CONFIGS[self.backbone])
        vit = DinoViT(
            patch_size=14,
            num_register_tokens=0,
            pos_embed_size=37,
            name="encoder",
            **cfg,
        )
        feats, prefix = vit(x)
        cls = prefix[-1][:, 0]  # final-layer class token
        out = MoGeHead(
            dim_in=cfg["dim"],
            dim_proj=self.dim_proj,
            dim_upsample=self.dim_upsample,
            num_res_blocks=self.num_res_blocks,
            name="head",
        )(feats, (h // 2, w // 2))
        out = _resize_bilinear(out, (h, w))
        scale = ScaleHead(hidden=self.scale_hidden, name="scale_head")(cls)

        pts_raw = out[..., 0:3]
        # remap_output='exp': z strictly positive; x, y stay linear.
        z = jnp.exp(pts_raw[..., 2])
        points = jnp.stack([pts_raw[..., 0], pts_raw[..., 1], z], axis=-1)
        points = points * scale[:, None, None, None]
        normal = out[..., 4:7]
        normal = normal / jnp.maximum(
            jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-8
        )
        return dict(
            points=points,
            depth=points[..., 2],
            mask_logit=out[..., 3],
            normal=normal,
            scale=scale,
        )
