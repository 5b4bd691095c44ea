"""Apple DepthPro in Flax — multi-scale ViT depth estimator.

JAX re-implementation of the network consumed by the reference's
AppleDepthPro predictor (depth_prediction/predictors/apple_depth_pro.py:29-68
via the apple/ml-depth-pro package). Architecture follows the HuggingFace
``DepthProForDepthEstimation`` port (transformers models/depth_pro), which
this implementation is numerically validated against in
tests/test_depth_pro_parity.py:

- a square input is rendered at 3 scales; each scale is cut into overlapping
  ViT-sized patches; all patches run through ONE shared DINOv2 patch encoder
  as a batch (the TPU-friendly part: one big [35, 577, 1024] ViT batch)
- per-scale feature maps are re-assembled from the patch grids (overlap
  cropped), plus two RAW intermediate-layer hooks of the full-res scale
- a separate DINOv2 image encoder provides global features
- DPT-style upsample/fuse/projection neck + fusion stage + conv head emit
  canonical inverse depth; an optional FOV branch estimates the focal length
  when intrinsics are unknown.

All shapes are static given the input size — the patch split / merge layout
is computed at trace time.
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .vit import DinoViT


def _resize(x, hw):
    """torch F.interpolate bilinear align_corners=False (half-pixel)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, hw[0], hw[1], c), method="bilinear")


def split_to_patches(x: jnp.ndarray, patch: int, overlap: float) -> jnp.ndarray:
    """[B, H, W, C] -> [L*B, patch, patch, C], block-row-major (torch
    F.unfold ordering: patch index varies slower than batch)."""
    b, h, w, c = x.shape
    if h == patch and w == patch:
        return x
    stride = int(patch * (1 - overlap))
    rows = (h - patch) // stride + 1
    cols = (w - patch) // stride + 1
    tiles = []
    for r in range(rows):
        for cc in range(cols):
            tiles.append(x[:, r * stride : r * stride + patch,
                           cc * stride : cc * stride + patch, :])
    return jnp.concatenate(tiles, axis=0)


def merge_patches(patches: jnp.ndarray, batch: int, padding: int) -> jnp.ndarray:
    """Inverse of split at feature resolution: [L*B, o, o, C] -> [B, O, O, C]
    with ``padding`` feature pixels cropped from interior merge edges
    (HF merge_patches semantics)."""
    n, o, _, c = patches.shape
    lpb = n // batch
    s = int(math.isqrt(lpb))
    if n == batch:
        return patches
    if lpb < 4:
        padding = 0
    padding = min(o // 4, padding)
    if padding == 0:
        m = patches.reshape(lpb, batch, o, o, c)[: s * s]
        m = m.reshape(s, s, batch, o, o, c)
        m = jnp.transpose(m, (2, 0, 3, 1, 4, 5))  # [B, s, o, s, o, C]
        return m.reshape(batch, s * o, s * o, c)
    rows = []
    i = 0
    for hh in range(s):
        row = []
        for ww in range(s):
            box = patches[batch * i : batch * (i + 1)]
            top = padding if hh != 0 else 0
            bot = padding if hh != s - 1 else 0
            left = padding if ww != 0 else 0
            right = padding if ww != s - 1 else 0
            row.append(box[:, top : o - bot, left : o - right, :])
            i += 1
        rows.append(jnp.concatenate(row, axis=2))
    return jnp.concatenate(rows, axis=1)


def reconstruct(hidden: jnp.ndarray, grid: int, batch: int, padding: int,
                out_hw) -> jnp.ndarray:
    """[N, seq, C] tokens -> [B, out, out, C] feature map (drop the cls
    token, merge the patch grid, bilinear-resize)."""
    n, seq, c = hidden.shape
    feats = hidden[:, -(grid * grid):, :].reshape(n, grid, grid, c)
    feats = merge_patches(feats, batch, padding)
    return _resize(feats, out_hw)


class UpsampleBlock(nn.Module):
    """1x1 proj (optional) + n ConvTranspose(2,2) upsamples."""

    intermediate: int
    out: int
    n_upsample: int
    use_proj: bool = True
    bias: bool = False

    @nn.compact
    def __call__(self, x):
        i = 0
        if self.use_proj:
            x = nn.Conv(self.intermediate, (1, 1), use_bias=self.bias,
                        name=f"layers_{i}")(x)
            i += 1
        for j in range(self.n_upsample):
            x = nn.ConvTranspose(self.out, (2, 2), strides=(2, 2),
                                 use_bias=self.bias, name=f"layers_{i}")(x)
            i += 1
        return x


class PreActResidual(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.ch, (3, 3), padding=1, name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.ch, (3, 3), padding=1, name="conv2")(y)
        return x + y


class FusionLayer(nn.Module):
    ch: int
    use_deconv: bool = True

    @nn.compact
    def __call__(self, x, residual=None):
        if residual is not None:
            x = x + PreActResidual(self.ch, name="rcu1")(residual)
        x = PreActResidual(self.ch, name="rcu2")(x)
        if self.use_deconv:
            x = nn.ConvTranspose(self.ch, (2, 2), strides=(2, 2),
                                 use_bias=False, name="deconv")(x)
        return nn.Conv(self.ch, (1, 1), name="projection")(x)


VIT_PRESETS = {
    # DepthPro-hf backbones: DINOv2-L/14 at 384 (24 blocks, dim 1024).
    "large": dict(dim=1024, depth=24, num_heads=16),
    # tiny preset for tests
    "tiny": dict(dim=32, depth=2, num_heads=2),
}


class DepthProNet(nn.Module):
    """Returns (canonical inverse depth [B, H, W], fov_deg [B] or None)."""

    vit_dim: int = 1024
    vit_depth: int = 24
    vit_heads: int = 16
    vit_image_size: int = 384
    vit_patch: int = 14
    fusion: int = 256
    intermediate_hook_ids: Sequence[int] = (11, 5)
    intermediate_feature_dims: Sequence[int] = (256, 256)
    scaled_images_ratios: Sequence[float] = (0.25, 0.5, 1.0)
    scaled_images_overlap_ratios: Sequence[float] = (0.0, 0.5, 0.25)
    scaled_images_feature_dims: Sequence[int] = (1024, 1024, 512)
    merge_padding_value: int = 3
    use_fov: bool = False
    num_fov_head_layers: int = 2

    def _vit(self, name, out_layers=None, norms=None):
        grid = self.vit_image_size // self.vit_patch
        return DinoViT(
            dim=self.vit_dim,
            depth=self.vit_depth,
            num_heads=self.vit_heads,
            patch_size=self.vit_patch,
            out_layers=out_layers or (self.vit_depth - 1,),
            out_layers_norm=norms,
            pos_embed_size=grid,
            name=name,
        )

    @nn.compact
    def __call__(self, x):
        """x: [B, S, S, 3] normalized, S a multiple of vit grid scaling."""
        b, h, w, _ = x.shape
        psize = self.vit_image_size
        grid = psize // self.vit_patch
        n_scales = len(self.scaled_images_ratios)
        n_hooks = len(self.intermediate_hook_ids)

        # ---- patch encoder over all scales in one ViT batch
        per_scale = []
        for ratio, ov in zip(
            self.scaled_images_ratios, self.scaled_images_overlap_ratios
        ):
            scaled = _resize(x, (int(h * ratio), int(w * ratio)))
            per_scale.append(split_to_patches(scaled, psize, ov))
        counts = [p.shape[0] for p in per_scale]
        patches = jnp.concatenate(per_scale[::-1], axis=0)  # high res first

        hooks = tuple(self.intermediate_hook_ids[::-1])  # ascending (5, 11)
        out_layers = hooks + (self.vit_depth - 1,)
        norms = (False,) * n_hooks + (True,)
        pe_outs, _ = self._vit(
            "patch_encoder", out_layers=out_layers, norms=norms
        )(patches)
        # pe_outs: grids [N, g, g, C] per out layer (hooks raw, final normed)
        final_tokens = pe_outs[-1].reshape(patches.shape[0], grid * grid, -1)

        # split final tokens back per scale (reversed order: high res first)
        splits = np.cumsum(counts[::-1])[:-1]
        per_scale_tokens = [
            t for t in jnp.split(final_tokens, splits, axis=0)
        ][::-1]

        exponent = int(math.log2(w / grid))
        base_h, base_w = h // 2**exponent, w // 2**exponent

        features = []
        for i in range(n_scales):
            pad = int(self.merge_padding_value / self.scaled_images_ratios[i])
            features.append(
                reconstruct(
                    per_scale_tokens[i], grid, b, pad,
                    (base_h * 2**i, base_w * 2**i),
                )
            )
        # intermediate hooks come from the FULL-RES scale's patches, which
        # sit at the FRONT of the reversed concat.
        n_full = counts[-1]
        inter_features = []
        for i, hook in enumerate(self.intermediate_hook_ids):
            idx = hooks.index(hook)
            tok = pe_outs[idx][:n_full].reshape(n_full, grid * grid, -1)
            pad = int(self.merge_padding_value / self.scaled_images_ratios[-1])
            inter_features.append(
                reconstruct(
                    tok, grid, b, pad,
                    (base_h * 2 ** (n_scales - 1), base_w * 2 ** (n_scales - 1)),
                )
            )

        # ---- image encoder (global context)
        img_in = _resize(x, (psize, psize))
        ie_outs, _ = self._vit("image_encoder")(img_in)
        image_feature = _resize(
            ie_outs[0], (base_h, base_w)
        )

        feats: List[jnp.ndarray] = [image_feature, *features, *inter_features]

        # ---- neck: upsample, fuse image with low res, project
        fdims = list(self.scaled_images_feature_dims)
        feats[0] = UpsampleBlock(
            self.vit_dim, fdims[0], 1, use_proj=False, bias=True,
            name="up_image",
        )(feats[0])
        for i, fd in enumerate(fdims):
            feats[i + 1] = UpsampleBlock(
                fd, fd, 1, name=f"up_scaled_{i}"
            )(feats[i + 1])
        for i, fd in enumerate(self.intermediate_feature_dims):
            inter_dim = self.fusion if i == 0 else fd
            feats[n_scales + i + 1] = UpsampleBlock(
                inter_dim, fd, 2 + i, name=f"up_inter_{i}"
            )(feats[n_scales + i + 1])

        glob = jnp.concatenate([feats[1], feats[0]], axis=-1)
        glob = nn.Conv(fdims[0], (1, 1), name="fuse_image_low")(glob)
        feats = [glob, *feats[2:]]

        proj_dims = fdims + list(self.intermediate_feature_dims)
        for i, pd in enumerate(proj_dims):
            if i == len(proj_dims) - 1 and pd == self.fusion:
                continue  # identity projection
            feats[i] = nn.Conv(
                self.fusion, (3, 3), padding=1, use_bias=False,
                name=f"proj_{i}",
            )(feats[i])

        # ---- fusion stage (coarse -> fine, deconv between levels)
        fused = None
        for i, f in enumerate(feats[:-1]):
            layer = FusionLayer(self.fusion, name=f"fusion_{i}")
            fused = layer(f) if fused is None else layer(fused, f)
        fused = FusionLayer(
            self.fusion, use_deconv=False, name="fusion_final"
        )(fused, feats[-1])

        # ---- head
        y = nn.Conv(self.fusion // 2, (3, 3), padding=1, name="head_0")(fused)
        y = nn.ConvTranspose(
            self.fusion // 2, (2, 2), strides=(2, 2), name="head_1"
        )(y)
        y = nn.Conv(32, (3, 3), padding=1, name="head_2")(y)
        y = nn.relu(y)
        y = nn.Conv(1, (1, 1), name="head_4")(y)
        inv_depth = nn.relu(y)[..., 0]

        fov_deg = None
        if self.use_fov:
            # HF: fov uses the post-neck global feature, gradient-detached.
            fov_outs, _ = self._vit("fov_encoder")(img_in)
            fov_tok = nn.Dense(self.fusion // 2, name="fov_neck")(
                fov_outs[0].reshape(b, grid * grid, -1)
            )
            fov_feat = _resize(
                fov_tok.reshape(b, grid, grid, -1), (base_h, base_w)
            )
            g = nn.Conv(
                self.fusion // 2, (3, 3), strides=(2, 2), padding=1,
                name="fov_conv",
            )(jax.lax.stop_gradient(feats[0]))
            y = fov_feat + nn.relu(g)
            y = _resize(y, (grid, grid))
            ch = self.fusion
            for i in range(self.num_fov_head_layers):
                y = nn.Conv(
                    math.ceil(ch / 2 ** (i + 2)), (3, 3), strides=(2, 2),
                    padding=1, name=f"fov_head_{2 * i}",
                )(y)
                y = nn.relu(y)
            k = int((grid - 1) / 2**self.num_fov_head_layers + 1)
            y = nn.Conv(
                1, (k, k), padding=0,
                name=f"fov_head_{2 * self.num_fov_head_layers}",
            )(y)
            fov_deg = y.reshape(b)
        return inv_depth, fov_deg
