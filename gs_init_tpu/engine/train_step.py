"""Functional jitted training step.

The reference's hot loop (runner.py:424-709) is an imperative torch loop;
here it is a pure function (params, opt, strategy stats, batch, step, rng) ->
(params', opt', stats', metrics) compiled once by XLA. Host code (runner.py
in this package) only does IO, logging, checkpointing and the (jitted but
separate) densification calls on refine boundaries.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.render import rasterize
from ..ops.sh import num_sh_bases
from ..ops.ssim import ssim
from .optim import AdamConfig, AdamState, adam_update
from .params import GaussianParams, GaussianState
from .strategy import default as default_strategy


class Batch(NamedTuple):
    camtoworlds: jnp.ndarray  # [B, 4, 4]
    Ks: jnp.ndarray  # [B, 3, 3]
    pixels: jnp.ndarray  # [B, H, W, 3] float in [0, 1]
    image_ids: jnp.ndarray  # [B] int32
    # Optional sparse depth supervision (cfg.depth_loss):
    depth_points: Optional[jnp.ndarray] = None  # [B, M, 2] pixel coords
    depth_values: Optional[jnp.ndarray] = None  # [B, M] SfM depths (0 = pad)


def sh_coeff_mask(step: jnp.ndarray, sh_degree: int, interval: int) -> jnp.ndarray:
    """[K-1] mask of active shN coefficients for the +1-degree-per-interval
    schedule (reference runner.py:464) without recompilation."""
    active_deg = jnp.minimum(step // interval, sh_degree)
    n_active = (active_deg + 1) ** 2
    idx = jnp.arange(1, num_sh_bases(sh_degree))
    return (idx < n_active).astype(jnp.float32)


def make_train_step(cfg, acfg: AdamConfig, width: int, height: int):
    """Build the jitted train step for a fixed image size."""

    rasterize_kw = dict(
        sh_degree=cfg.sh_degree,
        near_plane=cfg.near_plane,
        far_plane=cfg.far_plane,
        rasterize_mode="antialiased" if cfg.antialiased else "classic",
        camera_model=cfg.camera_model,
        tile_size=cfg.tile_size,
        pair_capacity=cfg.pair_capacity,
        chunk_size=cfg.chunk_size,
        impl=cfg.rasterizer_impl,
        render_mode="RGB+ED" if cfg.depth_loss else "RGB",
    )

    def loss_fn(params: GaussianParams, dummy, alive, batch: Batch, step, key):
        scales, opacities = params.activated()
        sh = params.sh_coeffs()
        mask = sh_coeff_mask(step, cfg.sh_degree, cfg.sh_degree_interval)
        sh = sh.at[:, 1:, :].multiply(mask[None, :, None])
        viewmats = jnp.linalg.inv(batch.camtoworlds)

        bkgd = None
        if cfg.random_bkgd:
            bkgd = jax.random.uniform(key, (batch.pixels.shape[0], 3))

        render, alpha, info = rasterize(
            params.means,
            params.quats,
            scales,
            opacities,
            sh,
            viewmats,
            batch.Ks,
            width,
            height,
            backgrounds=bkgd,
            alive=alive,
            means2d_dummy=dummy,
            **rasterize_kw,
        )
        colors = render[..., :3]
        if cfg.random_bkgd:
            pixels = batch.pixels + (1.0 - alpha) * bkgd[:, None, None, :]
        else:
            pixels = batch.pixels

        l1 = jnp.mean(jnp.abs(colors - pixels))
        ssim_val = ssim(colors, pixels)
        loss = (1.0 - cfg.ssim_lambda) * l1 + cfg.ssim_lambda * (1.0 - ssim_val)

        if cfg.depth_loss and batch.depth_points is not None:
            # Sparse disparity loss against SfM depths (reference
            # runner.py:516-528): bilinear-free nearest sampling of the ED
            # channel at projected SfM pixels.
            depth = render[..., 3]
            pts = batch.depth_points.astype(jnp.int32)
            b_idx = jnp.arange(depth.shape[0])[:, None]
            sampled = depth[b_idx, pts[..., 1], pts[..., 0]]
            valid = batch.depth_values > 0
            disp = jnp.where(valid, 1.0 / jnp.maximum(sampled, 1e-6), 0.0)
            disp_gt = jnp.where(
                valid, 1.0 / jnp.maximum(batch.depth_values, 1e-6), 0.0
            )
            nvalid = jnp.maximum(jnp.sum(valid), 1)
            depthloss = jnp.sum(jnp.abs(disp - disp_gt)) / nvalid
            loss = loss + cfg.depth_lambda * depthloss

        if cfg.opacity_reg > 0.0:
            loss = loss + cfg.opacity_reg * jnp.mean(
                jnp.where(alive, jnp.abs(opacities), 0.0)
            )
        if cfg.scale_reg > 0.0:
            loss = loss + cfg.scale_reg * jnp.mean(
                jnp.where(alive[:, None], jnp.abs(scales), 0.0)
            )

        aux = dict(
            l1=l1,
            ssim=ssim_val,
            radii=info.radii,
            overflow=info.overflow,
            alpha_mean=jnp.mean(alpha),
        )
        return loss, aux

    @jax.jit
    def train_step(
        gstate: GaussianState,
        adam: AdamState,
        sstate,
        batch: Batch,
        step: jnp.ndarray,
        key: jax.Array,
    ):
        dummy = jnp.zeros(
            (batch.pixels.shape[0], gstate.params.capacity, 2), jnp.float32
        )
        (loss, aux), (grads, dgrads) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(gstate.params, dummy, gstate.alive, batch, step, key)

        params, adam = adam_update(gstate.params, grads, adam, acfg, step)
        sstate = default_strategy.update_state(
            sstate, dgrads, aux["radii"], width, height
        )
        metrics = dict(
            loss=loss,
            l1=aux["l1"],
            ssim=aux["ssim"],
            overflow=aux["overflow"],
            alpha_mean=aux["alpha_mean"],
        )
        return gstate._replace(params=params), adam, sstate, metrics

    return train_step
