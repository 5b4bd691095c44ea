"""Reference (pure-XLA) differentiable rasterizer: O(N * pixels), no binning.

This is the correctness oracle for the production tile rasterizer
(ops/rasterize.py) — the role gsplat's ``_torch_impl`` plays for its CUDA
kernels. It composites every valid gaussian against every pixel in global
depth order, with gradients provided by autodiff. Chunked over pixels to
bound memory; usable on CPU (tests) and for tiny scenes on TPU.

Semantics match gsplat's forward (reference call site runner.py:341-362):
  sigma = 0.5 (A dx^2 + C dy^2) + B dx dy
  alpha = clamp(opacity * exp(-sigma), max=0.999), skipped when alpha < 1/255
  C(p)  = sum_i c_i alpha_i prod_{j<i} (1 - alpha_j) + T_final * background
plus an expected-depth channel (render_mode="RGB+ED").
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .projection import Projected

ALPHA_MAX = 0.999
ALPHA_MIN = 1.0 / 255.0


def _pixel_grid(width: int, height: int) -> jnp.ndarray:
    """Pixel-center coordinates, [H*W, 2] (x, y) with +0.5 center offset."""
    ys, xs = jnp.mgrid[0:height, 0:width]
    return jnp.stack([xs + 0.5, ys + 0.5], axis=-1).reshape(-1, 2).astype(jnp.float32)


def alpha_at(
    means2d: jnp.ndarray,  # [N, 2]
    conics: jnp.ndarray,  # [N, 3]
    opacities: jnp.ndarray,  # [N]
    valid: jnp.ndarray,  # [N] bool
    pix: jnp.ndarray,  # [P, 2]
    radii: jnp.ndarray | None = None,  # [N] for tile-consistency filtering
    tile_size: int | None = None,
    extents: jnp.ndarray | None = None,  # [N, 2] per-axis half-extents
) -> jnp.ndarray:
    """Per-gaussian per-pixel alpha, [N, P]. Shared semantics with the kernel.

    When ``tile_size`` is given, a gaussian only contributes to pixels whose
    tile intersects its support bbox — the same approximation the tile
    rasterizer (and gsplat's CUDA binning) makes, so the two paths agree
    bitwise in coverage. The bbox is the elliptical per-axis AABB when
    ``extents`` is given (what bin_gaussians uses), else the bounding circle.
    """
    dx = pix[None, :, 0] - means2d[:, None, 0]
    dy = pix[None, :, 1] - means2d[:, None, 1]
    a, b, c = conics[:, 0:1], conics[:, 1:2], conics[:, 2:3]
    sigma = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
    alpha = opacities[:, None] * jnp.exp(-sigma)
    alpha = jnp.minimum(alpha, ALPHA_MAX)
    ok = valid[:, None] & (sigma >= 0.0) & (alpha >= ALPHA_MIN)
    if tile_size is not None:
        ts = float(tile_size)
        if extents is not None:
            rx = extents[:, 0].astype(jnp.float32)[:, None]
            ry = extents[:, 1].astype(jnp.float32)[:, None]
        else:
            rx = ry = radii.astype(jnp.float32)[:, None]
        ptx = jnp.floor(pix[None, :, 0] / ts)
        pty = jnp.floor(pix[None, :, 1] / ts)
        gx0 = jnp.floor((means2d[:, None, 0] - rx) / ts)
        gx1 = jnp.floor((means2d[:, None, 0] + rx) / ts)
        gy0 = jnp.floor((means2d[:, None, 1] - ry) / ts)
        gy1 = jnp.floor((means2d[:, None, 1] + ry) / ts)
        ok = ok & (ptx >= gx0) & (ptx <= gx1) & (pty >= gy0) & (pty <= gy1)
    return jnp.where(ok, alpha, 0.0)


def composite_chunk(
    alpha: jnp.ndarray,  # [N, P] in depth order
    colors: jnp.ndarray,  # [N, 3]
    depths: jnp.ndarray,  # [N]
    t_in: jnp.ndarray,  # [P] incoming transmittance
):
    """Front-to-back alpha compositing of one gaussian chunk, vectorized.

    Exclusive transmittance products are computed in log space with a cumsum
    (the Pallas kernel does the same with a Hillis-Steele shifted-add scan).
    """
    log1m = jnp.log1p(-alpha)
    log_t_excl = jnp.cumsum(log1m, axis=0) - log1m  # exclusive prefix
    w = alpha * jnp.exp(log_t_excl) * t_in[None, :]  # [N, P]
    color = jnp.einsum("np,nc->pc", w, colors)
    depth = jnp.einsum("np,n->p", w, depths)
    t_out = t_in * jnp.exp(jnp.sum(log1m, axis=0))
    # acc from transmittance (not sum of weights) so it stays in [0, 1]
    # under f32 rounding on TPU.
    acc = t_in - t_out
    return color, depth, acc, t_out


@partial(jax.jit, static_argnames=("width", "height", "pixel_chunk", "tile_size"))
def rasterize_reference(
    proj: Projected,
    colors: jnp.ndarray,  # [C, N, 3]
    width: int,
    height: int,
    backgrounds: jnp.ndarray | None = None,  # [C, 3]
    pixel_chunk: int = 4096,
    tile_size: int | None = None,
):
    """Render [C, H, W, 3] color, [C, H, W] alpha and expected depth."""
    num_cams = proj.means2d.shape[0]
    pix_all = _pixel_grid(width, height)
    npix = pix_all.shape[0]
    pad = (-npix) % pixel_chunk
    pix_padded = jnp.concatenate(
        [pix_all, jnp.full((pad, 2), -1e6, jnp.float32)], axis=0
    ).reshape(-1, pixel_chunk, 2)

    def render_one(means2d, conics, opac, depths, radii, cols, exts):
        valid = radii > 0
        order = jnp.argsort(jnp.where(valid, depths, jnp.inf))
        means2d, conics = means2d[order], conics[order]
        opac, depths = opac[order], depths[order]
        valid, cols, radii = valid[order], cols[order], radii[order]
        exts = None if exts is None else exts[order]

        def body(pix):
            alpha = alpha_at(
                means2d, conics, opac, valid, pix, radii, tile_size,
                extents=exts,
            )
            t0 = jnp.ones(pix.shape[0], jnp.float32)
            color, depth, acc, _ = composite_chunk(alpha, cols, depths, t0)
            return color, depth, acc

        # checkpoint: without it the VJP stacks each map iteration's
        # residuals into full [N, H*W] arrays — 135 GB at a 131k capacity
        # and 160x120 render. Rematerializing alpha per pixel chunk keeps
        # backward memory at O(N x pixel_chunk).
        color, depth, acc = jax.lax.map(jax.checkpoint(body), pix_padded)
        color = color.reshape(-1, 3)[:npix].reshape(height, width, 3)
        depth = depth.reshape(-1)[:npix].reshape(height, width)
        acc = acc.reshape(-1)[:npix].reshape(height, width)
        return color, depth, acc

    color, depth, acc = jax.vmap(render_one)(
        proj.means2d, proj.conics, proj.opacities, proj.depths, proj.radii,
        colors, proj.extents,
    )
    if backgrounds is not None:
        color = color + (1.0 - acc)[..., None] * backgrounds[:, None, None, :]
    return color, acc, depth
