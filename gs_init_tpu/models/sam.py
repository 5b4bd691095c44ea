"""Segment Anything (SAM) in Flax: ViT image encoder + prompt encoder +
mask decoder.

JAX re-implementation of the model behind the reference's SAM segmenter
(depth_alignment/segmentation/sam.py:20-33 loads
``sam_model_registry["vit_h"](sam_vit_h_4b8939.pth)`` from the
segment_anything package). Faithful to the official checkpoint layout so
converted weights reproduce the network (mdi/predictors/sam_convert.py;
random-weights torch-oracle parity in tests/test_sam_parity.py):

- ImageEncoderViT: 16x16 patch embed, learned absolute pos embed, blocks
  with decomposed relative position attention, 14x14 windowed attention
  except at the global-attention indexes, 2-conv neck with LayerNorm2d.
- PromptEncoder: random-Fourier positional encoding, learned point-type
  embeddings, no-mask dense embedding.
- MaskDecoder: IoU + mask tokens, TwoWayTransformer (depth 2), transposed-
  conv upscaling, per-token hypernetwork MLPs, IoU head.

All shapes static; point prompts run batched (vmapped) for the automatic
mask generator (mdi/segmentation_sam.py).
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class LayerNorm2d(nn.Module):
    """Channel-wise LayerNorm over NHWC feature maps (SAM's LayerNorm2d)."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + self.eps) * w + b


def _rel_pos_resized(rel_pos: jnp.ndarray, q_size: int, k_size: int):
    """Select relative position embeddings for (q, k) index deltas."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    # Official checkpoints store exactly 2*size-1 entries for their trained
    # size; interpolation path (different q/k) mirrors get_rel_pos.
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos[None], (1, max_rel_dist, rel_pos.shape[1]), "linear"
        )[0]
    qc = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    kc = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (qc - kc) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


class WindowAttention(nn.Module):
    """Attention with decomposed relative positions over [B, H, W, C]."""

    dim: int
    num_heads: int
    use_rel_pos: bool = True
    input_size: Tuple[int, int] = (14, 14)

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        head = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, name="qkv")(x.reshape(b, h * w, self.dim))
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, head)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4)).reshape(
            3, b * self.num_heads, h * w, head
        )
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * head**-0.5) @ jnp.swapaxes(k, -2, -1)
        if self.use_rel_pos:
            rph = self.param(
                "rel_pos_h",
                nn.initializers.zeros,
                (2 * self.input_size[0] - 1, head),
            )
            rpw = self.param(
                "rel_pos_w",
                nn.initializers.zeros,
                (2 * self.input_size[1] - 1, head),
            )
            Rh = _rel_pos_resized(rph, h, h)  # [h, h, head]
            Rw = _rel_pos_resized(rpw, w, w)
            r_q = q.reshape(b * self.num_heads, h, w, head)
            rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh)
            rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw)
            attn = attn.reshape(b * self.num_heads, h, w, h, w)
            attn = attn + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
            attn = attn.reshape(b * self.num_heads, h * w, h * w)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).reshape(b, self.num_heads, h * w, head)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


def _window_partition(x, win):
    b, h, w, c = x.shape
    ph = (win - h % win) % win
    pw = (win - w % win) % win
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // win, win, wp // win, win, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, win, win, c)
    return x, (hp, wp)


def _window_unpartition(x, win, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = x.shape[0] // (hp // win * (wp // win))
    x = x.reshape(b, hp // win, wp // win, win, win, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class EncoderBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    window_size: int = 14
    input_size: Tuple[int, int] = (64, 64)

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        hw = x.shape[1:3]
        if self.window_size > 0:
            x, pad_hw = _window_partition(x, self.window_size)
            attn_size = (self.window_size, self.window_size)
        else:
            attn_size = self.input_size
        x = WindowAttention(
            self.dim, self.num_heads, input_size=attn_size, name="attn"
        )(x)
        if self.window_size > 0:
            x = _window_unpartition(x, self.window_size, pad_hw, hw)
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_lin1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp_lin2")(y)
        return x + y


class SamImageEncoder(nn.Module):
    img_size: int = 1024
    patch_size: int = 16
    dim: int = 1280  # vit_h
    depth: int = 32
    num_heads: int = 16
    window_size: int = 14
    global_attn_indexes: Sequence[int] = (7, 15, 23, 31)
    out_chans: int = 256

    @nn.compact
    def __call__(self, x):
        """x: [B, S, S, 3] normalized -> [B, S/16, S/16, 256]."""
        g = self.img_size // self.patch_size
        x = nn.Conv(
            self.dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            name="patch_embed",
        )(x)
        pos = self.param(
            "pos_embed", nn.initializers.zeros, (1, g, g, self.dim)
        )
        if x.shape[1:3] != (g, g):
            pos = jax.image.resize(
                pos, (1, x.shape[1], x.shape[2], self.dim), "bicubic"
            )
        x = x + pos
        grid = (x.shape[1], x.shape[2])
        for i in range(self.depth):
            x = EncoderBlock(
                self.dim,
                self.num_heads,
                window_size=0 if i in self.global_attn_indexes else self.window_size,
                input_size=grid,
                name=f"blocks_{i}",
            )(x)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, name="neck_0")(x)
        x = LayerNorm2d(self.out_chans, name="neck_1")(x)
        x = nn.Conv(
            self.out_chans, (3, 3), padding=1, use_bias=False, name="neck_2"
        )(x)
        return LayerNorm2d(self.out_chans, name="neck_3")(x)


class SamPromptEncoder(nn.Module):
    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)

    def setup(self):
        self.pe_gaussian = self.param(
            "pe_gaussian",
            nn.initializers.normal(1.0),
            (2, self.embed_dim // 2),
        )
        # 0: negative point, 1: positive point, 2/3: box corners.
        self.point_embeddings = [
            self.param(f"point_embed_{i}", nn.initializers.normal(1.0), (self.embed_dim,))
            for i in range(4)
        ]
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (self.embed_dim,)
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (self.embed_dim,)
        )

    def _pe(self, coords):
        """coords in [0, 1] -> random Fourier features [..., embed_dim]."""
        c = 2.0 * coords - 1.0
        c = c @ self.pe_gaussian
        c = 2.0 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def dense_pe(self):
        h, w = self.image_embedding_size
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(
            jnp.meshgrid(xs, ys, indexing="xy"), axis=-1
        )  # [h, w, 2] (x, y)
        return self._pe(grid)  # [h, w, C]

    def __call__(self, points, labels):
        """points [B, P, 2] pixel xy; labels [B, P] (1 pos, 0 neg, -1 pad).

        Returns (sparse [B, P, C], dense [h, w, C])."""
        coords = (points + 0.5) / jnp.asarray(
            [self.input_image_size[1], self.input_image_size[0]], jnp.float32
        )
        pe = self._pe(coords)
        pe = jnp.where((labels == -1)[..., None], 0.0, pe)
        emb = jnp.where(
            (labels == -1)[..., None],
            self.not_a_point_embed,
            jnp.where(
                (labels == 1)[..., None],
                self.point_embeddings[1],
                self.point_embeddings[0],
            ),
        )
        return pe + emb, self.no_mask_embed


class DecoderAttention(nn.Module):
    embed_dim: int
    num_heads: int
    downsample_rate: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        d = self.embed_dim // self.downsample_rate
        head = d // self.num_heads
        qp = nn.Dense(d, name="q_proj")(q)
        kp = nn.Dense(d, name="k_proj")(k)
        vp = nn.Dense(d, name="v_proj")(v)

        def split(t):
            b, n, _ = t.shape
            return jnp.transpose(
                t.reshape(b, n, self.num_heads, head), (0, 2, 1, 3)
            )

        qh, kh, vh = split(qp), split(kp), split(vp)
        attn = jax.nn.softmax(
            (qh / math.sqrt(head)) @ jnp.swapaxes(kh, -2, -1), axis=-1
        )
        out = attn @ vh
        b, _, n, _ = out.shape
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, d)
        return nn.Dense(self.embed_dim, name="out_proj")(out)


class TwoWayBlock(nn.Module):
    embed_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    skip_first_layer_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = DecoderAttention(
                self.embed_dim, self.num_heads, name="self_attn"
            )(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + DecoderAttention(
                self.embed_dim, self.num_heads, name="self_attn"
            )(q, q, queries)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DecoderAttention(
            self.embed_dim, self.num_heads, downsample_rate=2,
            name="cross_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm2")(queries)

        y = nn.Dense(self.mlp_dim, name="mlp_lin1")(queries)
        y = nn.relu(y)
        y = nn.Dense(self.embed_dim, name="mlp_lin2")(y)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm3")(queries + y)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DecoderAttention(
            self.embed_dim, self.num_heads, downsample_rate=2,
            name="cross_attn_image_to_token",
        )(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-5, name="norm4")(keys)
        return queries, keys


class SamMaskDecoder(nn.Module):
    embed_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    num_multimask: int = 3
    iou_head_hidden: int = 256

    @nn.compact
    def __call__(self, image_embed, image_pe, sparse_prompt, dense_embed):
        """image_embed [B, h, w, C]; image_pe [h, w, C]; sparse_prompt
        [B, P, C]; dense_embed [C] (no-mask). Returns (masks
        [B, 1+num_multimask, 4h, 4w], iou_pred [B, 1+num_multimask])."""
        b, h, w, c = image_embed.shape
        n_mask_tokens = self.num_multimask + 1
        iou_token = self.param(
            "iou_token", nn.initializers.normal(1.0), (1, c)
        )
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (n_mask_tokens, c)
        )
        tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.broadcast_to(tokens[None], (b,) + tokens.shape)
        tokens = jnp.concatenate([tokens, sparse_prompt], axis=1)

        src = image_embed + dense_embed
        src = src.reshape(b, h * w, c)
        pos = jnp.broadcast_to(image_pe.reshape(1, h * w, c), (b, h * w, c))

        queries, keys = tokens, src
        queries, keys = TwoWayBlock(
            self.embed_dim, self.num_heads, self.mlp_dim,
            skip_first_layer_pe=True, name="layer_0",
        )(queries, keys, tokens, pos)
        queries, keys = TwoWayBlock(
            self.embed_dim, self.num_heads, self.mlp_dim, name="layer_1"
        )(queries, keys, tokens, pos)
        q = queries + tokens
        k = keys + pos
        queries = queries + DecoderAttention(
            self.embed_dim, self.num_heads, downsample_rate=2,
            name="final_attn",
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm_final")(queries)

        iou_out = queries[:, 0]
        mask_out = queries[:, 1 : 1 + n_mask_tokens]

        x = keys.reshape(b, h, w, c)
        x = nn.ConvTranspose(
            c // 4, (2, 2), strides=(2, 2), name="upscale_0"
        )(x)
        x = LayerNorm2d(c // 4, name="upscale_1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.ConvTranspose(
            c // 8, (2, 2), strides=(2, 2), name="upscale_3"
        )(x)
        x = nn.gelu(x, approximate=False)  # [B, 4h, 4w, C/8]

        hyper = []
        for i in range(n_mask_tokens):
            t = mask_out[:, i]
            for j, dim in enumerate((c, c, c // 8)):
                t = nn.Dense(dim, name=f"hyper_{i}_lin{j}")(t)
                if j < 2:
                    t = nn.relu(t)
            hyper.append(t)
        hyper = jnp.stack(hyper, axis=1)  # [B, T, C/8]
        masks = jnp.einsum("btc,bhwc->bthw", hyper, x)

        t = iou_out
        for j, dim in enumerate(
            (self.iou_head_hidden, self.iou_head_hidden, n_mask_tokens)
        ):
            t = nn.Dense(dim, name=f"iou_lin{j}")(t)
            if j < 2:
                t = nn.relu(t)
        return masks, t
