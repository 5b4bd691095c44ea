"""Separable image filters (gaussian/box blur, first-order gradients).

JAX re-implementation of the reference's from-scratch filters
(utils/image_filtering.py:7-130): replicate padding, odd kernels; used by
adaptive subsampling, depth-gradient masks and region-margin computation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache
def _gauss_kernel(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1)
    k = np.exp(-(x**2) / (2 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def _sep_filter2d(img: jnp.ndarray, ky: np.ndarray, kx: np.ndarray) -> jnp.ndarray:
    """Apply separable filter with replicate padding. img: [H, W]."""
    ry, rx = len(ky) // 2, len(kx) // 2
    x = jnp.pad(img, ((ry, ry), (0, 0)), mode="edge")
    x = jax.vmap(lambda col: jnp.convolve(col, jnp.asarray(ky[::-1].copy()), mode="valid"))(x.T).T
    x = jnp.pad(x, ((0, 0), (rx, rx)), mode="edge")
    x = jax.vmap(lambda row: jnp.convolve(row, jnp.asarray(kx[::-1].copy()), mode="valid"))(x)
    return x


def gaussian_filter2d(img: jnp.ndarray, sigma: float = 1.0) -> jnp.ndarray:
    r = max(int(np.ceil(3 * sigma)), 1)
    k = _gauss_kernel(float(sigma), r)
    return _sep_filter2d(img, k, k)


def box_blur2d(img: jnp.ndarray, size: int) -> jnp.ndarray:
    k = np.full(size, 1.0 / size, np.float32)
    return _sep_filter2d(img, k, k)


def spatial_gradient_first_order(img: jnp.ndarray, sigma: float = 1.0):
    """Gaussian-derivative gradients (dy, dx) of [H, W]."""
    r = max(int(np.ceil(3 * sigma)), 1)
    g = _gauss_kernel(float(sigma), r)
    x = np.arange(-r, r + 1).astype(np.float32)
    dg = (-x / (sigma**2)) * g
    dy = _sep_filter2d(img, dg, g)
    dx = _sep_filter2d(img, g, dg)
    return dy, dx
