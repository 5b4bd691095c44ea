"""DPT (dense prediction transformer) depth head in Flax.

Re-implementation of the DPT head used by Depth-Anything-V2 (consumed by the
reference at depth_prediction/predictors/depth_anything_v2.py): per-stage
1x1 projections, transposed-conv / strided-conv reassembly to a 4-level
pyramid, RefineNet-style fusion with residual conv units, and the two-stage
output head. Relative models end in ReLU (disparity), metric models in
sigmoid * max_depth.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _resize(x, hw):
    """Bilinear resize with align_corners=True — matches the torch
    ``F.interpolate(..., align_corners=True)`` used throughout DPT heads
    (jax.image.resize only offers half-pixel mapping)."""
    b, h, w, c = x.shape
    H, W = hw
    if (H, W) == (h, w):
        return x

    def lerp_axis(arr, size_in, size_out, axis):
        if size_in == 1:
            reps = [1] * arr.ndim
            reps[axis] = size_out
            return jnp.tile(arr, reps)
        pos = jnp.linspace(0.0, size_in - 1.0, size_out)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, size_in - 2)
        f = (pos - lo).reshape([-1 if i == axis else 1 for i in range(arr.ndim)])
        a = jnp.take(arr, lo, axis=axis)
        b_ = jnp.take(arr, lo + 1, axis=axis)
        return a * (1.0 - f) + b_ * f

    x = lerp_axis(x, h, H, 1)
    return lerp_axis(x, w, W, 2)


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(y)
        return x + y


class FeatureFusionBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, skip=None, out_hw=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, name="rcu2")(x)
        if out_hw is None:
            out_hw = (x.shape[1] * 2, x.shape[2] * 2)
        x = _resize(x, out_hw)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class DPTHead(nn.Module):
    features: int = 64
    out_channels: Sequence[int] = (48, 96, 192, 384)
    metric: bool = False
    max_depth: float = 20.0

    @nn.compact
    def __call__(self, feats, patch_hw):
        """feats: 4 x [B, h, w, D] transformer features (shallow->deep);
        returns depth/disparity [B, 14*h, 14*w]."""
        ph, pw = patch_hw
        outs = []
        for i, f in enumerate(feats):
            y = nn.Conv(self.out_channels[i], (1, 1), name=f"project_{i}")(f)
            if i == 0:
                y = nn.ConvTranspose(
                    self.out_channels[i], (4, 4), strides=(4, 4),
                    name="resize_0",
                )(y)
            elif i == 1:
                y = nn.ConvTranspose(
                    self.out_channels[i], (2, 2), strides=(2, 2),
                    name="resize_1",
                )(y)
            elif i == 3:
                y = nn.Conv(
                    self.out_channels[i], (3, 3), strides=(2, 2), padding=1,
                    name="resize_3",
                )(y)
            outs.append(y)

        rn = [
            nn.Conv(
                self.features, (3, 3), padding=1, use_bias=False,
                name=f"layer{i + 1}_rn",
            )(outs[i])
            for i in range(4)
        ]
        path = FeatureFusionBlock(self.features, name="refinenet4")(
            rn[3], out_hw=rn[2].shape[1:3]
        )
        path = FeatureFusionBlock(self.features, name="refinenet3")(
            path, rn[2], out_hw=rn[1].shape[1:3]
        )
        path = FeatureFusionBlock(self.features, name="refinenet2")(
            path, rn[1], out_hw=rn[0].shape[1:3]
        )
        path = FeatureFusionBlock(self.features, name="refinenet1")(path, rn[0])

        y = nn.Conv(self.features // 2, (3, 3), padding=1, name="output_conv1")(
            path
        )
        y = _resize(y, (ph * 14, pw * 14))
        y = nn.Conv(32, (3, 3), padding=1, name="output_conv2_0")(y)
        y = nn.relu(y)
        y = nn.Conv(1, (1, 1), name="output_conv2_2")(y)
        if self.metric:
            y = nn.sigmoid(y) * self.max_depth
        else:
            y = nn.relu(y)
        return y[..., 0]


DPT_CONFIGS = {
    "vits": dict(features=64, out_channels=(48, 96, 192, 384)),
    "vitb": dict(features=128, out_channels=(96, 192, 384, 768)),
    "vitl": dict(features=256, out_channels=(256, 512, 1024, 1024)),
    "vitg": dict(features=384, out_channels=(1536, 1536, 1536, 1536)),
}
