"""SIFT descriptor prep for subsampled depth points.

TPU-native equivalent of the reference's kornia-based descriptor prep
(reference ``point_cloud_postprocess/prepare_descriptors.py:13-48``):
border-gates the subsampling mask, gathers grayscale patches at the kept
pixels, and computes 128-D SIFT descriptors for every patch in one batched
XLA program. Where the reference fills a patch tensor one indexed copy at a
time in Python and hands it to ``kornia.feature.SIFTDescriptor``, here the
patch gather is a vmapped ``dynamic_slice`` and the whole descriptor — soft
orientation binning plus bilinear 4x4 spatial pooling — is a single
``einsum`` contraction over precomputed pooling weights, i.e. MXU work with
static shapes instead of a per-patch loop.

Descriptor semantics follow Lowe's SIFT as implemented by kornia's
``SIFTDescriptor(patch_size, num_ang_bins, num_spatial_bins)``: per-pixel
gradient magnitude/orientation, Gaussian windowing, trilinear soft binning
into ``num_spatial_bins^2 x num_ang_bins`` cells, L2 -> clip(0.2) -> L2
normalization, optional RootSIFT. Exact kornia parity is untestable here
(kornia is not in the environment) and unnecessary — the reference feature
is unused dead code in its own main path; the oracle for tests is a
straightforward per-patch numpy implementation (tests/test_descriptors.py).
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

DESCRIPTOR_PATCH_SIZE = 32

# ITU-R BT.601 luma weights (matches kornia.color.rgb_to_grayscale).
_GRAY_W = (0.299, 0.587, 0.114)


def rgb_to_grayscale(image: jnp.ndarray) -> jnp.ndarray:
    """[H, W, 3] float in [0, 1] -> [H, W] luma."""
    r, g, b = image[..., 0], image[..., 1], image[..., 2]
    return _GRAY_W[0] * r + _GRAY_W[1] * g + _GRAY_W[2] * b


def border_mask(height: int, width: int, border: int) -> np.ndarray:
    """[H, W] bool, False within ``border`` pixels of any edge (the patch
    window must fit; reference ``prepare_descriptors.py:20-28``)."""
    m = np.zeros((height, width), dtype=bool)
    if height > 2 * border and width > 2 * border:
        m[border : height - border, border : width - border] = True
    return m


def extract_patches(
    gray: jnp.ndarray, yx: jnp.ndarray, patch_size: int
) -> jnp.ndarray:
    """Gather [N, P, P] patches centered at integer pixel coords yx [N, 2].

    Callers must pre-gate coordinates with :func:`border_mask`; a vmapped
    ``dynamic_slice`` (which clamps at edges) replaces the reference's
    per-index Python copy loop.
    """
    half = patch_size // 2

    def one(c):
        return jax.lax.dynamic_slice(
            gray, (c[0] - half, c[1] - half), (patch_size, patch_size)
        )

    return jax.vmap(one)(yx.astype(jnp.int32))


def _pooling_weights(patch_size: int, num_spatial_bins: int) -> np.ndarray:
    """[num_spatial_bins, patch_size] bilinear bin weights along one axis."""
    bin_w = patch_size / num_spatial_bins
    p = np.arange(patch_size, dtype=np.float64) + 0.5
    centers = (np.arange(num_spatial_bins, dtype=np.float64) + 0.5) * bin_w
    w = np.maximum(0.0, 1.0 - np.abs(p[None, :] - centers[:, None]) / bin_w)
    return w.astype(np.float32)


def _gaussian_window(patch_size: int) -> np.ndarray:
    """[P, P] Gaussian weighting window, sigma = patch_size / 2 (Lowe)."""
    sigma = patch_size / 2.0
    p = np.arange(patch_size, dtype=np.float64) + 0.5 - patch_size / 2.0
    g1 = np.exp(-0.5 * (p / sigma) ** 2)
    return np.outer(g1, g1).astype(np.float32)


def sift_descriptors(
    patches: jnp.ndarray,
    *,
    num_ang_bins: int = 8,
    num_spatial_bins: int = 4,
    clipval: float = 0.2,
    rootsift: bool = True,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """[N, P, P] grayscale patches -> [N, num_spatial_bins^2 * num_ang_bins]
    SIFT descriptors, fully batched.

    The trilinear histogram is expressed as one contraction: per-pixel
    orientation soft-assignments form [N, P, P, A]; bilinear spatial pooling
    against the precomputed per-axis weight matrices collapses it to
    [N, B, B, A] on the MXU.
    """
    n, p, _ = patches.shape
    # Central-difference gradients, replicate padding at the patch edge.
    padded = jnp.pad(patches, ((0, 0), (1, 1), (1, 1)), mode="edge")
    gx = 0.5 * (padded[:, 1:-1, 2:] - padded[:, 1:-1, :-2])
    gy = 0.5 * (padded[:, 2:, 1:-1] - padded[:, :-2, 1:-1])
    mag = jnp.sqrt(gx * gx + gy * gy + eps)
    ori = jnp.arctan2(gy, gx)  # [-pi, pi]

    # Soft (linear) orientation binning: each pixel votes into its two
    # neighbouring angle bins.
    two_pi = 2.0 * math.pi
    of = (ori % two_pi) / two_pi * num_ang_bins  # [0, A)
    bins = jnp.arange(num_ang_bins, dtype=jnp.float32)
    d = jnp.abs(of[..., None] - bins)  # [N, P, P, A]
    d = jnp.minimum(d, num_ang_bins - d)  # circular distance
    wo = jnp.maximum(0.0, 1.0 - d)

    votes = wo * (mag * jnp.asarray(_gaussian_window(p)))[..., None]
    wyx = jnp.asarray(_pooling_weights(p, num_spatial_bins))
    hist = jnp.einsum("yi,xj,nija->nyxa", wyx, wyx, votes)

    desc = hist.reshape(n, -1)
    desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True).clip(eps)
    desc = jnp.minimum(desc, clipval)
    desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True).clip(eps)
    if rootsift:
        desc = jnp.sqrt(desc / jnp.sum(desc, axis=-1, keepdims=True).clip(eps))
    return desc


def prepare_descriptors(
    image: jnp.ndarray,
    subsampling_mask: jnp.ndarray,
    *,
    patch_size: int = DESCRIPTOR_PATCH_SIZE,
    rootsift: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """SIFT descriptors at every kept pixel of a depth-subsampling mask.

    Mirrors the reference entry point (``prepare_descriptors.py:13-48``):
    the mask is first restricted to pixels whose ``patch_size`` window fits
    inside the image, then descriptors are computed at the survivors.

    Args:
        image: [H, W, 3] float RGB in [0, 1].
        subsampling_mask: [H*W] or [H, W] bool.

    Returns:
        (descriptors [M, 128] float32, gated mask flattened to [H*W] bool),
        M = number of surviving pixels (data-dependent, so this stage runs
        eagerly at init time like the rest of the mdi host pipeline).
    """
    h, w = int(image.shape[0]), int(image.shape[1])
    mask = np.asarray(subsampling_mask, dtype=bool).reshape(h, w)
    mask = mask & border_mask(h, w, patch_size // 2)
    ys, xs = np.nonzero(mask)
    if ys.size == 0:
        nbins = 128
        return np.zeros((0, nbins), np.float32), mask.reshape(-1)
    gray = rgb_to_grayscale(jnp.asarray(image, jnp.float32))
    patches = extract_patches(gray, jnp.stack([ys, xs], -1), patch_size)
    desc = sift_descriptors(patches, rootsift=rootsift)
    return np.asarray(desc), mask.reshape(-1)
