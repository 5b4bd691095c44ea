"""SSIM — TPU-native replacement for fused_ssim (reference runner.py:507-509).

11x11 gaussian window (sigma 1.5), C1=0.01^2, C2=0.03^2, ``padding="valid"``
to match the fused CUDA kernel the reference trains with. Implemented as two
separable 1-D convolutions per moment so XLA maps them onto the MXU/VPU and
fuses the elementwise SSIM map; differentiable by autodiff (the CUDA version
needs a hand-written backward — XLA derives ours).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache
def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - (size - 1) / 2
    w = np.exp(-(x**2) / (2 * sigma**2))
    return (w / w.sum()).astype(np.float32)


def _blur_valid(x: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Separable valid-padding gaussian filter over [B, H, W, C]."""
    k = window.shape[0]
    b, h, w, c = x.shape
    wy = jnp.asarray(window).reshape(k, 1, 1, 1)
    wx = jnp.asarray(window).reshape(1, k, 1, 1)
    dn = jax.lax.conv_dimension_numbers(x.shape, (k, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
    # Raised precision (bf16x3 ~ f32): TPU convs default to 1-pass bf16,
    # and the SSIM variance terms are differences E[x^2] - mu^2 compared
    # against c2 = 9e-4 — bf16 rounding catastrophically cancels on
    # low-variance regions (flat backgrounds), yielding ssim >> 1 and
    # garbage gradients that diverge real-scene training.
    y = jax.lax.conv_general_dilated(
        x, jnp.tile(wy, (1, 1, 1, c)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGH,
    )
    y = jax.lax.conv_general_dilated(
        y, jnp.tile(wx, (1, 1, 1, c)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGH,
    )
    return y


def _blur_valid_cfirst(x: jnp.ndarray, window: np.ndarray) -> jnp.ndarray:
    """Separable valid-padding gaussian filter over [N, H, W], channels-first.

    Each 1-D conv is a sum of k shifted slices — pure f32 VPU FMAs that XLA
    fuses into one pass. This sidesteps BOTH problems of the NHWC conv
    formulation on TPU: the lane dim is W (1296) instead of C (15, padded to
    128 = 8.5x wasted bandwidth), and there is no bf16 conv rounding, so no
    raised-precision multi-pass is needed (the SSIM variance cancellation
    lesson — see _blur_valid)."""
    k = window.shape[0]
    h_out = x.shape[1] - k + 1
    acc = window[0] * x[:, :h_out, :]
    for i in range(1, k):
        acc = acc + window[i] * x[:, i : i + h_out, :]
    w_out = x.shape[2] - k + 1
    out = window[0] * acc[:, :, :w_out]
    for i in range(1, k):
        out = out + window[i] * acc[:, :, i : i + w_out]
    return out


def ssim(
    img0: jnp.ndarray,  # [B, H, W, C] predictions in [0, 1]
    img1: jnp.ndarray,  # [B, H, W, C] targets
    c1: float = 0.01**2,
    c2: float = 0.03**2,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM over a batch (scalar), valid padding.

    All five moments (x, y, x^2, y^2, xy) are stacked channel-wise and
    blurred in one fused channels-first shifted-slice pass (fwd and autodiff
    bwd)."""
    w = _gaussian_window(window_size, sigma)
    b, h, wd, c = img0.shape
    i0 = jnp.transpose(img0, (0, 3, 1, 2))  # [B, C, H, W]
    i1 = jnp.transpose(img1, (0, 3, 1, 2))
    stacked = jnp.concatenate(
        [i0, i1, i0 * i0, i1 * i1, i0 * i1], axis=1
    ).reshape(b * 5 * c, h, wd)
    blurred = _blur_valid_cfirst(stacked, w)
    blurred = blurred.reshape(b, 5, c, *blurred.shape[1:])
    mu0, mu1, e00, e11, e01 = (
        blurred[:, 0],
        blurred[:, 1],
        blurred[:, 2],
        blurred[:, 3],
        blurred[:, 4],
    )
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    s00 = e00 - mu00
    s11 = e11 - mu11
    s01 = e01 - mu01
    m = ((2 * mu01 + c1) * (2 * s01 + c2)) / (
        (mu00 + mu11 + c1) * (s00 + s11 + c2)
    )
    return jnp.mean(m)


def psnr(img0: jnp.ndarray, img1: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((img0 - img1) ** 2)
    return 20.0 * jnp.log10(max_val) - 10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
