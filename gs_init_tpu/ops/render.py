"""High-level rasterization API — the gsplat.rendering.rasterization equivalent.

Mirrors the argument surface the reference consumes at runner.py:341-362
(camera_model, rasterize_mode classic/antialiased, render_mode RGB/RGB+ED,
near/far planes, radius_clip, backgrounds, sh_degree schedule) but runs the
TPU pipeline: XLA projection -> tile binning/sort -> Pallas compositor.

``impl="xla"`` routes to the pure-XLA oracle compositor instead (used on CPU
and for tiny scenes); "auto" picks pallas on TPU, xla on CPU.
"""
from __future__ import annotations

import os as _os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .projection import project_gaussians
from .rasterize import render_tiles, unpack_tiles
from .rasterize_ref import rasterize_reference
from .sh import sh_to_color
from .tiles import bin_gaussians, pack_table


class RenderInfo(NamedTuple):
    radii: jnp.ndarray  # [C, N] int32
    depths: jnp.ndarray  # [C, N]
    overflow: jnp.ndarray  # [] int32 dropped pairs (pallas path; 0 for xla)
    binning: object = None  # TileBinning (pallas path) for pair reductions


def rasterize(
    means: jnp.ndarray,  # [N, 3]
    quats: jnp.ndarray,  # [N, 4]
    scales: jnp.ndarray,  # [N, 3] post-activation
    opacities: jnp.ndarray,  # [N] post-activation
    colors: jnp.ndarray,  # [N, 3] rgb, or [N, K, 3] SH if sh_degree given
    viewmats: jnp.ndarray,  # [C, 4, 4]
    Ks: jnp.ndarray,  # [C, 3, 3]
    width: int,
    height: int,
    *,
    sh_degree: Optional[int] = None,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    eps2d: float = 0.3,
    rasterize_mode: str = "classic",  # or "antialiased"
    render_mode: str = "RGB",  # or "RGB+ED"
    backgrounds: Optional[jnp.ndarray] = None,  # [C, 3]
    camera_model: str = "pinhole",
    tile_size: int = 32,
    pair_capacity: int = 1 << 20,
    chunk_size: int = 128,
    alive: Optional[jnp.ndarray] = None,  # [N] bool capacity mask
    masks: Optional[jnp.ndarray] = None,  # [C, H, W] bool/float pixel mask
    means2d_dummy: Optional[jnp.ndarray] = None,  # [C, N, 2] zeros; grad taps
    pair_dummy: Optional[jnp.ndarray] = None,  # [C*N, 2] zeros; absgrad tap
    impl: str = "auto",
    pixel_chunk: int = 4096,
    reorder_table: bool = False,
    sort_bf16: bool = False,
    wire8: Optional[bool] = None,  # None = env GS_WIRE (default 8-col)
    sh_mask: Optional[jnp.ndarray] = None,  # [num_bases] 0/1 schedule mask
):
    """Render gaussians. Returns (render [C,H,W,3|4], alpha [C,H,W,1], info).

    ``means2d_dummy``: pass zeros and differentiate w.r.t. it to obtain
    screen-space positional gradients for densification (the JAX equivalent
    of gsplat's ``info["means2d"].grad``).
    """
    if impl == "auto":
        impl = "xla" if jax.default_backend() == "cpu" else "pallas"

    proj = project_gaussians(
        means,
        quats,
        scales,
        opacities,
        viewmats,
        Ks,
        width,
        height,
        near_plane=near_plane,
        far_plane=far_plane,
        eps2d=eps2d,
        antialiased=(rasterize_mode == "antialiased"),
        radius_clip=radius_clip,
        camera_model=camera_model,
        alive=alive,
    )

    means2d = proj.means2d
    if means2d_dummy is not None:
        means2d = means2d + means2d_dummy

    num_cams = viewmats.shape[0]
    if sh_degree is not None:
        # View directions from camera centers (c2w translation = -R^T t).
        centers = -jnp.einsum("cji,cj->ci", viewmats[:, :3, :3], viewmats[:, :3, 3])
        dirs = means[None, :, :] - centers[:, None, :]
        cam_colors = sh_to_color(
            jnp.broadcast_to(colors[None], (num_cams,) + colors.shape),
            dirs, sh_degree, basis_mask=sh_mask,
        )  # [C, N, 3]
    elif colors.ndim == 2:
        cam_colors = jnp.broadcast_to(colors[None], (num_cams,) + colors.shape)
    else:
        cam_colors = colors

    proj = proj._replace(means2d=means2d)

    if impl == "xla":
        color, alpha, depth_acc = rasterize_reference(
            proj, cam_colors, width, height,
            pixel_chunk=pixel_chunk, tile_size=tile_size,
        )
        overflow = jnp.int32(0)
    else:
        binning = bin_gaussians(
            means2d,
            proj.radii,
            proj.depths,
            width,
            height,
            tile_size,
            pair_capacity,
            chunk=chunk_size,
            reorder_rows=reorder_table,
            extents=proj.extents,
        )
        table = pack_table(
            means2d, proj.conics, proj.opacities, cam_colors, proj.depths
        )
        num_tiles = num_cams * binning.num_tiles_x * binning.num_tiles_y
        if wire8 is None:
            wire8 = _os.environ.get("GS_WIRE", "8") == "8"
        want_absgrad = pair_dummy is not None
        if pair_dummy is None:
            # Zeros tap required by render_tiles' VJP contract; XLA folds
            # the constant, and its cotangent is unused on this path.
            pair_dummy = jnp.zeros((table.shape[0], 2), jnp.float32)
        out = render_tiles(
            table,
            pair_dummy,
            binning.gid_sorted,
            binning.row_order,
            binning.tile_starts,
            binning.out_starts,
            binning.gauss_offsets,
            binning.gauss_counts,
            num_tiles,
            binning.num_tiles_x,
            binning.num_tiles_y,
            tile_size,
            chunk_size,
            render_mode == "RGB+ED",
            want_absgrad,
            sort_bf16,
            wire8,
        )
        color, alpha, depth_acc = unpack_tiles(
            out, num_cams, binning.num_tiles_x, binning.num_tiles_y,
            tile_size, width, height,
        )
        overflow = binning.overflow

    if backgrounds is not None:
        color = color + (1.0 - alpha)[..., None] * backgrounds[:, None, None, :]

    if render_mode == "RGB+ED":
        # Expected depth: accumulated depth normalized by accumulated alpha.
        ed = depth_acc / jnp.maximum(alpha, 1e-10)
        render = jnp.concatenate([color, ed[..., None]], axis=-1)
    elif render_mode == "RGB":
        render = color
    else:
        raise ValueError(f"unsupported render_mode {render_mode!r}")

    if masks is not None:
        # Zero every channel at masked-out pixels (reference
        # runner.py:363-364: ``render_colors[~masks] = 0``).
        render = render * masks[..., None].astype(render.dtype)

    info = RenderInfo(
        radii=proj.radii,
        depths=proj.depths,
        overflow=overflow,
        binning=binning if impl == "pallas" else None,
    )
    return render, alpha[..., None], info
