"""Camera-pose, appearance and bilateral-grid optimization modules.

JAX equivalents of the reference's L5a stack:
- CameraOpt: per-image 9D delta (3 translation + 6D rotation, Zhou et al.)
  right-multiplied onto camtoworld (utils/runner_utils.py:13-49,118-139)
- AppearanceOpt: per-image embedding + per-gaussian feature + SH-basis view
  encoding -> MLP color residual (utils/runner_utils.py:52-115)
- BilateralGrid: per-view [12, L, H, W] grids of 3x4 color affines sliced
  with grayscale guidance; total-variation regularizer; ``color_correct``
  quadratic-expansion least-squares warp for evaluation (lib_bilagrid.py)

All are plain parameter pytrees + pure functions so they drop into the
jitted train step as extra optimizer groups.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

from ..ops.sh import eval_sh_bases, num_sh_bases


# ------------------------------------------------------------------ pose opt


def init_pose_params(n_images: int, std: float = 0.0, key=None) -> jnp.ndarray:
    """[n, 9] pose deltas; zero (or gaussian for perturbation tests)."""
    if std > 0:
        return std * jax.random.normal(key, (n_images, 9))
    return jnp.zeros((n_images, 9))


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """Zhou et al. continuous 6D rotation -> 3x3 matrix. [..., 6] -> [..., 3, 3]."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-8)
    a2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2 / jnp.maximum(jnp.linalg.norm(a2, axis=-1, keepdims=True), 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def apply_pose_deltas(
    camtoworlds: jnp.ndarray,  # [B, 4, 4]
    pose_params: jnp.ndarray,  # [n_images, 9]
    image_ids: jnp.ndarray,  # [B]
) -> jnp.ndarray:
    deltas = pose_params[image_ids]  # [B, 9]
    dx, drot = deltas[..., :3], deltas[..., 3:]
    identity = jnp.array([1.0, 0, 0, 0, 1.0, 0])
    rot = rotation_6d_to_matrix(drot + identity)
    b = camtoworlds.shape[0]
    transform = jnp.tile(jnp.eye(4), (b, 1, 1))
    transform = transform.at[:, :3, :3].set(rot)
    transform = transform.at[:, :3, 3].set(dx)
    return camtoworlds @ transform


# ------------------------------------------------------------- appearance opt


class AppearanceParams(NamedTuple):
    embeds: jnp.ndarray  # [n_images, embed_dim]
    features: jnp.ndarray  # [CAP, feature_dim] per-gaussian
    w0: jnp.ndarray
    b0: jnp.ndarray
    w1: jnp.ndarray
    b1: jnp.ndarray
    w2: jnp.ndarray
    b2: jnp.ndarray


def init_appearance_params(
    key,
    n_images: int,
    capacity: int,
    feature_dim: int = 32,
    embed_dim: int = 16,
    sh_degree: int = 3,
    mlp_width: int = 64,
) -> AppearanceParams:
    k = jax.random.split(key, 4)
    in_dim = embed_dim + feature_dim + num_sh_bases(sh_degree)
    glorot = jax.nn.initializers.glorot_uniform()
    return AppearanceParams(
        embeds=jnp.zeros((n_images, embed_dim)),
        features=jnp.zeros((capacity, feature_dim)),
        w0=glorot(k[0], (in_dim, mlp_width)),
        b0=jnp.zeros((mlp_width,)),
        w1=glorot(k[1], (mlp_width, mlp_width)),
        b1=jnp.zeros((mlp_width,)),
        w2=glorot(k[2], (mlp_width, 3)),
        b2=jnp.zeros((3,)),
    )


def appearance_colors(
    params: AppearanceParams,
    image_ids: jnp.ndarray,  # [C]
    dirs: jnp.ndarray,  # [C, N, 3]
    active_sh_degree,  # dynamic scalar
    max_sh_degree: int,
) -> jnp.ndarray:
    """MLP color residual, [C, N, 3] (added to sh0 color, sigmoid by caller)."""
    c, n = dirs.shape[:2]
    ndirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
    bases = eval_sh_bases(max_sh_degree, ndirs)  # [C, N, K]
    # Zero bases above the active degree (schedule-compatible, static shape).
    kidx = jnp.arange(bases.shape[-1])
    n_active = (active_sh_degree + 1) ** 2
    bases = jnp.where(kidx[None, None, :] < n_active, bases, 0.0)
    embeds = jnp.broadcast_to(
        params.embeds[image_ids][:, None, :], (c, n, params.embeds.shape[-1])
    )
    feats = jnp.broadcast_to(params.features[None], (c, n, params.features.shape[-1]))
    h = jnp.concatenate([embeds, feats, bases], axis=-1)
    h = jax.nn.relu(h @ params.w0 + params.b0)
    h = jax.nn.relu(h @ params.w1 + params.b1)
    return h @ params.w2 + params.b2


# ------------------------------------------------------------ bilateral grid


def init_bilateral_grids(
    n_images: int, shape=(16, 16, 8)
) -> jnp.ndarray:
    """[n, L, H, W, 12] grids initialized to the identity 3x4 affine."""
    gw, gh, gl = shape
    identity = jnp.array([1.0, 0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0, 0])
    return jnp.tile(identity, (n_images, gl, gh, gw, 1))


def _rgb2gray(rgb: jnp.ndarray) -> jnp.ndarray:
    return (
        0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    )


def slice_bilateral_grid(
    grids: jnp.ndarray,  # [n, L, H, W, 12]
    rgb: jnp.ndarray,  # [B, H_img, W_img, 3] rendered colors (guidance+input)
    image_ids: jnp.ndarray,  # [B]
) -> jnp.ndarray:
    """Trilinear slice: (x, y, gray) -> 3x4 affine applied to rgb."""
    b, hi, wi, _ = rgb.shape
    g = grids[image_ids]  # [B, L, H, W, 12]
    _, gl, gh, gw, _ = g.shape
    gray = jnp.clip(_rgb2gray(rgb), 0.0, 1.0)
    xs = (jnp.arange(wi) + 0.5) / wi * (gw - 1)
    ys = (jnp.arange(hi) + 0.5) / hi * (gh - 1)
    zs = gray * (gl - 1)  # [B, H, W]
    x = jnp.broadcast_to(xs[None, None, :], (b, hi, wi))
    y = jnp.broadcast_to(ys[None, :, None], (b, hi, wi))

    def tri(coord, size):
        c0 = jnp.clip(jnp.floor(coord).astype(jnp.int32), 0, size - 2)
        f = coord - c0
        return c0, jnp.clip(f, 0.0, 1.0)

    x0, fx = tri(x, gw)
    y0, fy = tri(y, gh)
    z0, fz = tri(zs, gl)
    bidx = jnp.arange(b)[:, None, None]
    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                wgt = (
                    (fz if dz else 1 - fz)
                    * (fy if dy else 1 - fy)
                    * (fx if dx else 1 - fx)
                )
                out = out + wgt[..., None] * g[
                    bidx, z0 + dz, y0 + dy, x0 + dx
                ]
    aff = out.reshape(b, hi, wi, 3, 4)
    return (
        jnp.einsum("bhwij,bhwj->bhwi", aff[..., :3], rgb) + aff[..., 3]
    )


def total_variation_loss(grids: jnp.ndarray) -> jnp.ndarray:
    """Mean squared difference between neighboring grid cells (3 axes)."""
    tv = 0.0
    for ax in (1, 2, 3):
        d = jnp.diff(grids, axis=ax)
        tv = tv + jnp.mean(d * d)
    return tv


def color_correct(
    img: jnp.ndarray, ref: jnp.ndarray, num_iters: int = 5, eps: float = 0.5 / 255
) -> jnp.ndarray:
    """Per-channel quadratic-expansion least-squares color warp of ``img``
    toward ``ref`` (the reference's eval-time cc_psnr, lib_bilagrid.py:56-126)."""
    x = img.reshape(-1, 3)
    y = ref.reshape(-1, 3)
    # Quadratic expansion: [r,g,b, r*g, r*b, g*b, r^2, g^2, b^2, 1]
    feats = jnp.concatenate(
        [
            x,
            x[:, :1] * x[:, 1:2],
            x[:, :1] * x[:, 2:3],
            x[:, 1:2] * x[:, 2:3],
            x * x,
            jnp.ones((x.shape[0], 1)),
        ],
        axis=1,
    )
    out = []
    for c in range(3):
        a = feats
        b = y[:, c]
        w, *_ = jnp.linalg.lstsq(a, b, rcond=None)
        out.append(jnp.clip(a @ w, 0.0, 1.0))
    return jnp.stack(out, axis=-1).reshape(img.shape)


# ------------------------------------------------------------------ CP4D grid


class CP4DGridParams(NamedTuple):
    """Low-rank 4D bilateral grid (reference lib_bilagrid.py:399-574):
    a rank-R CP decomposition of a (12, W, Z, Y, X) affine grid over
    (gray, z, y, x). fac0 mixes rank coefficients to 3x4 affines; each
    spatial dim has a frozen init factor plus a learnable residual (TV-
    regularized), sampled by 1-D linear interpolation."""

    fac0: jnp.ndarray  # [12, rank]
    facs_init: tuple  # 4 x [rank, grid_dim] frozen (x, y, z, w order)
    facs_resid: tuple  # 4 x [rank, grid_dim] learnable residuals
    gray_w: tuple  # learnable rgb->gray MLP (list of (W, b)) or ()


_IDENTITY_AFFINE = np.eye(3, 4, dtype=np.float32).reshape(12)


def init_cp4d_grid(
    key,
    grid_x: int = 16,
    grid_y: int = 16,
    grid_z: int = 16,
    grid_w: int = 8,
    rank: int = 5,
    learn_gray: bool = True,
    gray_mlp_width: int = 8,
    gray_mlp_depth: int = 2,
    init_noise_scale: float = 1e-6,
) -> CP4DGridParams:
    """Identity-affine init: the reference runs tensorly's parafac on the
    (noised) identity grid; the identity grid is exactly rank-1, so we
    build the equivalent factorization directly — column 0 carries the
    identity, the remaining rank columns start at noise scale."""
    ks = jax.random.split(key, 6 + 2 * max(gray_mlp_depth, 1))
    fac0 = jnp.concatenate(
        [
            jnp.asarray(_IDENTITY_AFFINE)[:, None],
            init_noise_scale
            * jax.random.normal(ks[0], (12, rank - 1)),
        ],
        axis=1,
    )
    dims = (grid_x, grid_y, grid_z, grid_w)
    facs_init = tuple(
        jnp.concatenate(
            [
                jnp.ones((1, d)),
                init_noise_scale * jax.random.normal(ks[1 + i], (rank - 1, d)),
            ],
            axis=0,
        )
        for i, d in enumerate(dims)
    )
    facs_resid = tuple(jnp.zeros((rank, d)) for d in dims)
    gray_w = ()
    if learn_gray:
        widths = [3] + [gray_mlp_width] * (gray_mlp_depth - 1) + [1]
        layers = []
        for i in range(len(widths) - 1):
            w = jax.random.normal(ks[5 + i], (widths[i], widths[i + 1])) * (
                1.0 / np.sqrt(widths[i])
            )
            layers.append((w, jnp.zeros((widths[i + 1],))))
        gray_w = tuple(layers)
    return CP4DGridParams(
        fac0=fac0, facs_init=facs_init, facs_resid=facs_resid, gray_w=gray_w
    )


def _interp1d(fac: jnp.ndarray, coord: jnp.ndarray) -> jnp.ndarray:
    """Linear interp of [rank, G] rows at coord in [-1, 1] (torch
    grid_sample align_corners=True, border padding). Returns [N, rank]."""
    g = fac.shape[1]
    t = jnp.clip((coord + 1.0) * 0.5, 0.0, 1.0) * (g - 1)
    i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, g - 1)
    i1 = jnp.clip(i0 + 1, 0, g - 1)
    f = t - i0
    return fac.T[i0] * (1.0 - f[:, None]) + fac.T[i1] * f[:, None]


def cp4d_rgb2gray(params: CP4DGridParams, rgb: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] guidance; learnable MLP (scaled tanh x2) or BT601 weights."""
    if params.gray_w:
        h = rgb
        n = len(params.gray_w)
        for i, (w, b) in enumerate(params.gray_w):
            h = h @ w + b
            if i < n - 1:
                h = jax.nn.relu(h)
        return 2.0 * jnp.tanh(h[..., 0])
    return rgb @ jnp.asarray([0.299, 0.587, 0.114]) * 2.0 - 1.0


def slice_cp4d_grid(
    params: CP4DGridParams,
    xyz: jnp.ndarray,  # [..., 3] world coords
    rgb: jnp.ndarray,  # [..., 3]
    bound: float = 2.0,
) -> jnp.ndarray:
    """Slice per-point 3x4 color affines from the low-rank grid [..., 3, 4]."""
    sh = xyz.shape[:-1]
    x = xyz.reshape(-1, 3) / bound
    c = rgb.reshape(-1, 3)
    gray = cp4d_rgb2gray(params, c)
    coords = [x[:, 0], x[:, 1], x[:, 2], gray]
    coef = jnp.ones((x.shape[0], params.fac0.shape[1]))
    for fac_i, fac_r, co in zip(
        params.facs_init, params.facs_resid, coords
    ):
        coef = coef * _interp1d(fac_i + fac_r, co)
    mat = coef @ params.fac0.T  # [N, 12]
    return mat.reshape(*sh, 3, 4)


def cp4d_apply(params: CP4DGridParams, xyz, rgb, bound: float = 2.0):
    """Apply the sliced affine to rgb: [..., 3]."""
    m = slice_cp4d_grid(params, xyz, rgb, bound)
    return jnp.einsum("...ij,...j->...i", m[..., :3], rgb) + m[..., 3]


def cp4d_tv_loss(params: CP4DGridParams) -> jnp.ndarray:
    """TV on the learnable factor residuals (reference tv_loss :533-541)."""
    tv = jnp.float32(0.0)
    for fac in params.facs_resid:
        d = fac[:, 1:] - fac[:, :-1]
        tv = tv + jnp.mean(d * d)
    return tv
