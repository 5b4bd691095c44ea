"""DINOv2-style Vision Transformer backbone in Flax.

JAX re-implementation of the backbone consumed by the reference's depth
predictors (Depth-Anything-V2's DINOv2 encoder; the vendored Metric3D uses
the register variant — third_party/metric3d/mono/model/backbones/). Faithful
to the torch checkpoints so converted weights reproduce the networks:
patch embed (14x14), cls token (+ optional register tokens), bicubically
interpolated position embeddings, pre-norm blocks with LayerScale, GELU MLP.

All matmuls are MXU-shaped (token dims multiples of 128 for the standard
backbones); inference is batched and jitted by the caller.
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def torch_bicubic_matrix(n_in: int, n_out: int, scale: float) -> np.ndarray:
    """1D interpolation matrix W [n_out, n_in] matching torch
    ``F.interpolate(mode='bicubic', align_corners=False)`` with an explicit
    ``scale_factor``: src = (dst + 0.5) / scale - 0.5, cubic convolution
    kernel A = -0.75, border taps clamped (replicate)."""
    A = -0.75

    def kern(d):
        d = abs(d)
        if d <= 1.0:
            return (A + 2.0) * d**3 - (A + 3.0) * d**2 + 1.0
        if d < 2.0:
            return A * d**3 - 5.0 * A * d**2 + 8.0 * A * d - 4.0 * A
        return 0.0

    W = np.zeros((n_out, n_in), np.float64)
    for i in range(n_out):
        src = (i + 0.5) / scale - 0.5
        f = math.floor(src)
        frac = src - f
        for j in range(-1, 3):
            W[i, min(max(f + j, 0), n_in - 1)] += kern(j - frac)
    return W.astype(np.float32)


class Mlp(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, name="fc2")(x)


class Attention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        b, n, d = x.shape
        h = self.num_heads
        qkv = nn.Dense(3 * d, name="qkv")(x).reshape(b, n, 3, h, d // h)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, Dh]
        q = jnp.swapaxes(q, 1, 2)  # [B, H, N, Dh]
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
        scale = (d // h) ** -0.5
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = jnp.swapaxes(out, 1, 2).reshape(b, n, d)
        return nn.Dense(d, name="proj")(out)


class LayerScale(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        return x * gamma


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        y = Attention(self.dim, self.num_heads, name="attn")(y)
        x = x + LayerScale(self.dim, name="ls1")(y)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(y)
        return x + LayerScale(self.dim, name="ls2")(y)


class DinoViT(nn.Module):
    """Returns intermediate layer outputs (final-norm applied), cls tokens."""

    dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 14
    num_register_tokens: int = 0
    out_layers: Sequence[int] = (2, 5, 8, 11)
    pos_embed_size: int = 37  # grid side the checkpoint was trained with
    # "resize" = jax.image.resize bicubic (A=-0.5, half-pixel); "torch" =
    # exact torch bicubic with DINOv2's +interpolate_offset scale trick
    # (vendored Metric3D ViT_DINO_reg.py interpolate_pos_encoding).
    pos_interp: str = "resize"
    interpolate_offset: float = 0.1
    # Per-out_layer flag: apply the final LayerNorm to that output (HF
    # "hidden_states" hooks are RAW layer outputs; the last_hidden_state is
    # normed — DepthPro consumes both). None = norm everything.
    out_layers_norm: Optional[Sequence[bool]] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray
    ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        """x: [B, H, W, 3] normalized; H, W multiples of patch_size.

        Returns (features [B, h, w, D] per out_layer, cls tokens [B, D])."""
        b, h, w, _ = x.shape
        ph, pw = h // self.patch_size, w // self.patch_size
        x = nn.Conv(
            self.dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            name="patch_embed",
        )(x)
        x = x.reshape(b, ph * pw, self.dim)

        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.dim)
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, self.pos_embed_size * self.pos_embed_size + 1, self.dim),
        )
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        grid = patch_pos.reshape(
            1, self.pos_embed_size, self.pos_embed_size, self.dim
        )
        if (ph, pw) != (self.pos_embed_size, self.pos_embed_size):
            if self.pos_interp == "torch":
                n = self.pos_embed_size
                wh = torch_bicubic_matrix(
                    n, ph, (ph + self.interpolate_offset) / n
                )
                ww = torch_bicubic_matrix(
                    n, pw, (pw + self.interpolate_offset) / n
                )
                grid = jnp.einsum(
                    "hH,wW,bHWd->bhwd",
                    jnp.asarray(wh),
                    jnp.asarray(ww),
                    grid,
                )
            else:
                grid = jax.image.resize(
                    grid, (1, ph, pw, self.dim), method="bicubic"
                )
        x = x + grid.reshape(1, ph * pw, self.dim)
        tokens = [jnp.broadcast_to(cls + cls_pos, (b, 1, self.dim))]
        if self.num_register_tokens:
            reg = self.param(
                "register_tokens",
                nn.initializers.zeros,
                (1, self.num_register_tokens, self.dim),
            )
            tokens.append(jnp.broadcast_to(reg, (b,) + reg.shape[1:]))
        x = jnp.concatenate(tokens + [x], axis=1)

        n_prefix = 1 + self.num_register_tokens
        final_norm = nn.LayerNorm(epsilon=1e-6, name="norm")
        feats = {}
        for i in range(self.depth):
            x = Block(self.dim, self.num_heads, name=f"blocks_{i}")(x)
            if i in self.out_layers:
                feats[i] = x
        norm_flags = self.out_layers_norm or (True,) * len(self.out_layers)
        outs, prefix_outs = [], []
        for layer, do_norm in zip(self.out_layers, norm_flags):
            y = final_norm(feats[layer]) if do_norm else feats[layer]
            outs.append(y[:, n_prefix:].reshape(b, ph, pw, self.dim))
            prefix_outs.append(y[:, :n_prefix])
        return outs, prefix_outs


VIT_CONFIGS = {
    "vits": dict(dim=384, depth=12, num_heads=6, out_layers=(2, 5, 8, 11)),
    "vitb": dict(dim=768, depth=12, num_heads=12, out_layers=(2, 5, 8, 11)),
    "vitl": dict(dim=1024, depth=24, num_heads=16, out_layers=(4, 11, 17, 23)),
    "vitg": dict(
        dim=1536, depth=40, num_heads=24, out_layers=(9, 19, 29, 39)
    ),
}
