"""Metric3D v2 decoder — RAFT-style DPT with iterative ConvGRU refinement.

Flax re-implementation of the vendored decoder the reference uses
(third_party/metric3d/mono/model/decode_heads/RAFTDepthNormalDPTDecoder5.py):

- token readout: patch tokens projected + cls/register tokens projected and
  broadcast-added (DPT readout), reassembled to a 4-level pyramid
  (1/14, 1/14, 1/7, 1/4)
- monocular decoder: DPT fuse blocks -> shared feature map + depth/normal
  confidence channels; depth from a 256-anchor log-bin expectation
  (depth_normalize (0.1, 200), regress scale 100); normals via
  norm_normalize (unit xyz + elu-kappa)
- recurrent refinement: 3-level ConvGRU hierarchy (1/4, 1/7, 1/14) with
  slow-fast scheduling, flow head producing 6-channel deltas
  (depth, confidence, normal4), learned 9-neighbor convex upsampling
  (factor 2^n_downsample)

Inference-only (the reference never trains it). Checkpoint conversion from
the official torch weights follows the DA-V2 converter pattern and lands
with weight-validation work (no weights are fetchable in this environment).
"""
from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _resize(x, hw, method="bilinear", scale=None):
    if method == "bilinear":
        # torch align_corners=True semantics (interpolate_float32 in the
        # reference decoder).
        from .dpt import _resize as _resize_ac

        return _resize_ac(x, hw)
    # torch mode='nearest' with an explicit scale_factor: src index =
    # floor(dst / scale) — NOT jax.image.resize's half-pixel mapping.
    h, w = x.shape[1], x.shape[2]
    sy = scale if scale is not None else hw[0] / h
    sx = scale if scale is not None else hw[1] / w
    iy = jnp.asarray(
        np.clip(np.floor(np.arange(hw[0]) / sy).astype(np.int32), 0, h - 1)
    )
    ix = jnp.asarray(
        np.clip(np.floor(np.arange(hw[1]) / sx).astype(np.int32), 0, w - 1)
    )
    return x[:, iy][:, :, ix]


def _pool2x(x):
    return nn.avg_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


def norm_normalize(out):
    """xyz to unit norm, kappa = elu(k) + 1.01 (decoder :237-243)."""
    xyz, kappa = out[..., :3], out[..., 3:4]
    n = jnp.sqrt(jnp.sum(xyz * xyz, axis=-1, keepdims=True)) + 1e-10
    kappa = jax.nn.elu(kappa) + 1.01
    return jnp.concatenate([xyz / n, kappa], axis=-1)


class Readout(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, patch, learn):
        """patch [B,H,W,C]; learn [B,1,1,(1+reg)*C] -> [B,H,W,C]."""
        x = nn.Dense(self.dim, name="project_patch")(patch)
        y = nn.Dense(self.dim, use_bias=False, name="project_learn")(learn)
        return nn.gelu(x + y, approximate=False)


class Token2Feature(nn.Module):
    dim: int
    out: int
    scale: float  # 1, 2, or 3.5

    @nn.compact
    def __call__(self, patch, learn):
        x = Readout(self.dim, name="readout")(patch, learn)
        if self.scale == 1:
            return x
        if self.scale == 2:
            return nn.ConvTranspose(
                self.out, (2, 2), strides=(2, 2), name="sample"
            )(x)
        # fractional scale: nearest upsample then 1x1 conv
        h = int(x.shape[1] * self.scale)
        w = int(x.shape[2] * self.scale)
        x = _resize(x, (h, w), method="nearest", scale=self.scale)
        return nn.Conv(self.out, (1, 1), name="sample")(x)


class ConvBlock(nn.Module):
    """DPT conv block. NB: the reference's ``self.act = ReLU(inplace=True)``
    mutates the residual input — ``out = act(x)`` aliases x — so the block
    actually computes ``relu(x) + conv2(relu(conv1(relu(x))))`` (decoder
    :547-577). The trained checkpoints bake in this behavior."""

    ch: int

    @nn.compact
    def __call__(self, x):
        a = nn.relu(x)
        y = nn.Conv(self.ch, (3, 3), padding=1, name="conv1")(a)
        y = nn.relu(y)
        y = nn.Conv(self.ch, (3, 3), padding=1, name="conv2")(y)
        return a + y


class FuseBlock(nn.Module):
    in_ch: int
    out_ch: int
    fuse: bool = True
    upsample: bool = True
    scale: float = 2.0

    @nn.compact
    def __call__(self, x1, x2=None):
        if x2 is not None:
            x1 = x1 + ConvBlock(self.in_ch, name="way_branch")(x2)
        out = ConvBlock(self.in_ch, name="way_trunk")(x1)
        if self.upsample:
            h = int(out.shape[1] * self.scale)
            w = int(out.shape[2] * self.scale)
            out = _resize(out, (h, w))
        return nn.Conv(self.out_ch, (1, 1), name="out_conv")(out)


class ResidualBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv1")(x)
        y = nn.relu(nn.LayerNorm(name="norm1")(y))
        y = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv2")(y)
        y = nn.relu(nn.LayerNorm(name="norm2")(y))
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="downsample")(x)
            x = nn.LayerNorm(name="norm3")(x)
        return nn.relu(x + y)


class ConvGRU(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, h, cz, cr, cq, *inputs):
        x = jnp.concatenate(inputs, axis=-1)
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(nn.Conv(self.hidden, (3, 3), padding=1, name="convz")(hx) + cz)
        r = jax.nn.sigmoid(nn.Conv(self.hidden, (3, 3), padding=1, name="convr")(hx) + cr)
        q = jnp.tanh(
            nn.Conv(self.hidden, (3, 3), padding=1, name="convq")(
                jnp.concatenate([r * h, x], axis=-1)
            )
            + cq
        )
        return (1 - z) * h + z * q


class FlowHead(nn.Module):
    """Torch FlowHead(input_dim=hd, hidden_dim=2*hd): intermediate convs are
    hidden_dim // 2 = hd wide (decoder :317-321)."""

    hidden: int

    @nn.compact
    def __call__(self, x):
        mid = self.hidden // 2
        d = nn.Conv(mid, (3, 3), padding=1, name="conv1d")(x)
        d = nn.Conv(2, (3, 3), padding=1, name="conv2d")(nn.relu(d))
        n = nn.Conv(mid, (3, 3), padding=1, name="conv1n")(x)
        n = nn.Conv(4, (3, 3), padding=1, name="conv2n")(nn.relu(n))
        return jnp.concatenate([d, n], axis=-1)


class RAFTDepthNormalDecoder(nn.Module):
    """The full decode head. Configured for the Metric3D small/large/giant
    presets via channel tables."""

    vit_dim: int = 384
    feature_channels: Sequence[int] = (96, 192, 384, 768)
    decoder_channels: Sequence[int] = (48, 96, 192, 384, 384)
    hidden_dim: int = 48
    n_gru_layers: int = 3
    n_downsample: int = 2
    iters: int = 4
    num_anchors: int = 256
    min_val: float = 0.1
    max_val: float = 200.0
    regress_scale: float = 100.0

    def _clamp(self, x):
        y = nn.relu(x - self.min_val) + self.min_val
        return self.max_val - nn.relu(self.max_val - y)

    @nn.compact
    def __call__(self, patches, learns):
        """patches: 4 x [B, h, w, C] (shallow->deep); learns: 4 x
        [B, 1, 1, (1+reg)*C]. Returns (depth, confidence, normal) at
        (14 h / 2^?, ...) full crop resolution."""
        fc = self.feature_channels
        dc = self.decoder_channels
        hd = self.hidden_dim

        # Token -> feature pyramid (EncoderFeature, decoder :681-699).
        x = Token2Feature(self.vit_dim, fc[3], 1, name="read_3")(
            patches[3], learns[3]
        )
        x2 = Token2Feature(self.vit_dim, fc[2], 1, name="read_2")(
            patches[2], learns[2]
        )
        x1 = Token2Feature(self.vit_dim, fc[1], 2, name="read_1")(
            patches[1], learns[1]
        )
        x0 = Token2Feature(self.vit_dim, fc[0], 3.5, name="read_0")(
            patches[0], learns[0]
        )

        # Monocular DPT decoder (DecoderFeature) -> 1/4 feature + confs.
        y = FuseBlock(dc[4], dc[3], fuse=False, upsample=False, name="upconv_3")(x)
        y = FuseBlock(dc[3], dc[2], name="upconv_2")(y, x2)
        y = FuseBlock(dc[2], dc[1] + 2, scale=7 / 4, name="upconv_1")(y, x1)
        feature_map = y[..., :-2]
        depth_conf = y[..., -2:-1]
        normal_conf = y[..., -1:]

        # Depth: log-bin expectation (decoder :797-845).
        prob = nn.Conv(self.num_anchors, (3, 3), padding=1, name="depth_reg_0")(
            feature_map
        )
        prob = nn.Conv(self.num_anchors, (1, 1), name="depth_reg_2")(
            nn.relu(prob)
        )
        prob = jax.nn.softmax(prob, axis=-1)
        bins = jnp.exp(
            jnp.linspace(
                math.log(self.min_val), math.log(self.max_val), self.num_anchors
            )
        )
        d = jnp.sum(prob * bins, axis=-1, keepdims=True)
        depth_pred = (self._clamp(d) - self.max_val) / self.regress_scale

        nrm = nn.Conv(128, (3, 3), padding=1, name="normal_0")(feature_map)
        nrm = nn.Conv(128, (1, 1), name="normal_2")(nn.relu(nrm))
        nrm = nn.Conv(128, (1, 1), name="normal_4")(nn.relu(nrm))
        nrm = nn.Conv(3, (1, 1), name="normal_6")(nn.relu(nrm))
        normal_pred = norm_normalize(
            jnp.concatenate([nrm, normal_conf], axis=-1)
        )

        flow = jnp.concatenate([depth_pred, depth_conf, normal_pred], axis=-1)

        # Context features -> GRU hidden/context at 3 scales. NB: in the
        # reference, decoder_mono's inplace ReLUs have already mutated the
        # x1/x2 read outputs (way_branch act(x) aliases its input) by the
        # time the context encoder runs, so it sees relu(x1), relu(x2) but
        # raw x0 (decoder forward :906-934 + ConvBlock aliasing).
        enc = [x0, nn.relu(x1), nn.relu(x2)]
        nets, inps = [], []
        for i, (f, dim) in enumerate(zip(enc, (hd, hd, hd))):
            h = ResidualBlock(dim, name=f"ctx_hidden_res_{i}")(f)
            h = nn.Conv(dim, (3, 3), padding=1, name=f"ctx_hidden_conv_{i}")(h)
            c = ResidualBlock(dim, name=f"ctx_context_res_{i}")(f)
            c = nn.Conv(dim, (3, 3), padding=1, name=f"ctx_context_conv_{i}")(c)
            nets.append(jnp.tanh(h))
            zqr = nn.Conv(dim * 3, (3, 3), padding=1, name=f"ctx_zqr_{i}")(
                nn.relu(c)
            )
            inps.append(jnp.split(zqr, 3, axis=-1))

        gru08 = ConvGRU(hd, name="gru08")
        gru16 = ConvGRU(hd, name="gru16")
        gru32 = ConvGRU(hd, name="gru32")
        flow_head = FlowHead(2 * hd, name="flow_head")
        mask_conv0 = nn.Conv(hd, (3, 3), padding=1, name="mask_0")
        mask_conv2 = nn.Conv(factor_sq9 := 9 * 4**self.n_downsample, (1, 1), name="mask_2")

        def interp(a, dest):
            return _resize(a, dest.shape[1:3])

        def step32():
            nets[2] = gru32(nets[2], *inps[2], _pool2x(nets[1]))

        def step16():
            nets[1] = gru16(
                nets[1], *inps[1], interp(_pool2x(nets[0]), nets[1]),
                interp(nets[2], nets[1]),
            )

        factor = 2**self.n_downsample
        for _ in range(self.iters):
            # slow-fast scheduling (decoder :958-965): three update passes —
            # (32), (32, 16), (32, 16, 08 + flow/mask heads).
            step32()
            step32()
            step16()
            step32()
            step16()
            nets[0] = gru08(
                nets[0], *inps[0], flow, interp(nets[1], nets[0])
            )
            delta = flow_head(nets[0])
            flow = flow + delta

            mask = mask_conv0(nets[0])
            mask = mask_conv2(nn.relu(mask))
            mask = 0.25 * mask

        up = self._convex_upsample(flow, mask, factor)
        depth = self._clamp(up[..., 0] * self.regress_scale + self.max_val)
        confidence = up[..., 1]
        normal = norm_normalize(up[..., 2:])
        return depth, confidence, normal

    @staticmethod
    def _convex_upsample(flow, mask, factor):
        """Learned 9-neighbor convex upsampling (decoder upsample_flow)."""
        b, h, w, d = flow.shape
        mask = mask.reshape(b, h, w, 9, factor * factor)
        mask = jax.nn.softmax(mask, axis=3)
        # 3x3 neighborhoods of flow.
        pads = jnp.pad(flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
        neigh = jnp.stack(
            [
                pads[:, dy : dy + h, dx : dx + w]
                for dy in range(3)
                for dx in range(3)
            ],
            axis=3,
        )  # [B, H, W, 9, D]
        up = jnp.einsum("bhwnf,bhwnd->bhwfd", mask, neigh)
        up = up.reshape(b, h, w, factor, factor, d)
        up = jnp.transpose(up, (0, 1, 3, 2, 4, 5))
        return up.reshape(b, h * factor, w * factor, d)


RAFT_CONFIGS = {
    "small": dict(
        vit_dim=384,
        feature_channels=(96, 192, 384, 768),
        decoder_channels=(48, 96, 192, 384, 384),
        hidden_dim=48,
        iters=4,
    ),
    "large": dict(
        vit_dim=1024,
        feature_channels=(256, 512, 1024, 2048),
        decoder_channels=(128, 256, 512, 1024, 1024),
        hidden_dim=128,
        iters=8,
    ),
}
