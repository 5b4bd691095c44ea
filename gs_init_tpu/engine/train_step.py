"""Functional jitted training step.

The reference's hot loop (runner.py:424-709) is an imperative torch loop;
here it is a pure function (params, opt, strategy stats, aux modules, batch,
step, rng) -> updated states + metrics compiled once by XLA. Host code
(engine/runner.py) only does IO, logging, checkpointing and the (jitted but
separate) densification calls on refine boundaries.

Optional subsystems (all off by default, mirroring reference config):
- pose optimization (cfg.pose_opt): per-image SE3 deltas on camtoworlds
- appearance optimization (cfg.app_opt): embedding+feature MLP color path
  (replaces SH color; sh0 acts as the base color logit, runner.py:327-338)
- bilateral grid (cfg.use_bilateral_grid): per-view color affines + TV loss
- sparse SfM depth loss (cfg.depth_loss)
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.render import rasterize
from ..ops.sh import num_sh_bases
from ..ops.ssim import ssim
from .appearance import (
    appearance_colors,
    apply_pose_deltas,
    slice_bilateral_grid,
    total_variation_loss,
)
from .optim import (
    AdamConfig,
    AdamState,
    SimpleAdamState,
    adam_update,
    simple_adam_init,
    simple_adam_update,
)
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
    # Optional per-pixel sampling mask (1 = supervised); gradients through
    # masked-out pixels are stopped, matching the nerfbaselines integration
    # (reference method.py:439-443 detach-blend injection).
    sampling_mask: Optional[jnp.ndarray] = None  # [B, H, W, 1] float


class AuxParams(NamedTuple):
    """Optional per-image / appearance parameter groups (None = disabled)."""

    pose: Optional[jnp.ndarray] = None  # [n_images, 9]
    app: Optional[object] = None  # AppearanceParams
    grids: Optional[jnp.ndarray] = None  # [n_images, L, H, W, 12]


class AuxOptState(NamedTuple):
    pose: Optional[SimpleAdamState] = None
    app: Optional[SimpleAdamState] = None
    grids: Optional[SimpleAdamState] = None


def init_aux_opt(aux: AuxParams) -> AuxOptState:
    return AuxOptState(
        pose=simple_adam_init(aux.pose) if aux.pose is not None else None,
        app=simple_adam_init(aux.app) if aux.app is not None else None,
        grids=simple_adam_init(aux.grids) if aux.grids is not None else None,
    )


def sh_coeff_mask(step: jnp.ndarray, sh_degree: int, interval: int) -> jnp.ndarray:
    """[K-1] mask of active shN coefficients for the +1-degree-per-interval
    schedule (reference runner.py:464) without recompilation."""
    active_deg = jnp.minimum(step // interval, sh_degree)
    n_active = (active_deg + 1) ** 2
    idx = jnp.arange(1, num_sh_bases(sh_degree))
    return (idx < n_active).astype(jnp.float32)


def make_train_step(cfg, acfg: AdamConfig, width: int, height: int):
    """Build the jitted train step for a fixed image size."""
    use_absgrad = bool(getattr(cfg.strategy, "absgrad", False))
    # MCMC relocation never reads the grad2d stats — skip accumulating them
    # (the reference's MCMCStrategy likewise keeps no screen-grad state).
    track_stats = type(cfg.strategy).__name__ != "MCMCStrategyConfig"

    rasterize_kw = dict(
        near_plane=cfg.near_plane,
        far_plane=cfg.far_plane,
        rasterize_mode="antialiased" if cfg.antialiased else "classic",
        camera_model=cfg.camera_model,
        tile_size=cfg.tile_size,
        pair_capacity=cfg.pair_capacity,
        chunk_size=cfg.chunk_size,
        reorder_table=getattr(cfg, "reorder_table", False),
        sort_bf16=getattr(cfg, "sort_bf16", False),
        wire8=getattr(cfg, "wire8", None),
        impl=cfg.rasterizer_impl,
        render_mode="RGB+ED" if cfg.depth_loss else "RGB",
    )

    def loss_fn(
        params: GaussianParams, dummy, pair_dummy, aux: AuxParams, alive,
        batch: Batch, step, key,
    ):
        scales, opacities = params.activated()
        c2w = batch.camtoworlds
        if cfg.pose_opt and aux.pose is not None:
            c2w = apply_pose_deltas(c2w, aux.pose, batch.image_ids)
        viewmats = jnp.linalg.inv(c2w)

        bkgd = None
        if cfg.random_bkgd:
            bkgd = jax.random.uniform(key, (batch.pixels.shape[0], 3))
        elif getattr(cfg, "background_color", None) is not None:
            # Fixed background (reference method.py:453-456 injection).
            bkgd = jnp.tile(
                jnp.asarray(cfg.background_color, jnp.float32)[None],
                (batch.pixels.shape[0], 1),
            )

        sh_mask = None
        if cfg.app_opt and aux.app is not None:
            centers = c2w[:, :3, 3]
            dirs = params.means[None, :, :] - centers[:, None, :]
            active_deg = jnp.minimum(
                step // cfg.sh_degree_interval, cfg.sh_degree
            )
            resid = appearance_colors(
                aux.app, batch.image_ids, dirs, active_deg, cfg.sh_degree
            )
            colors = jax.nn.sigmoid(resid + params.sh0[None, :, 0, :])
            sh_degree_arg = None
        else:
            colors = params.sh_coeffs()
            # Degree schedule rides the SH BASIS inside rasterize (a [K]
            # mask) — masking the [N, K, 3] coefficients here cost a
            # full-buffer copy + VJP every step (~1.4 ms at garden scale).
            sh_mask = jnp.concatenate(
                [
                    jnp.ones((1,), jnp.float32),
                    sh_coeff_mask(step, cfg.sh_degree, cfg.sh_degree_interval),
                ]
            )
            sh_degree_arg = cfg.sh_degree

        render, alpha, info = rasterize(
            params.means,
            params.quats,
            scales,
            opacities,
            colors,
            viewmats,
            batch.Ks,
            width,
            height,
            sh_degree=sh_degree_arg,
            sh_mask=sh_mask,
            backgrounds=bkgd,
            alive=alive,
            means2d_dummy=dummy,
            pair_dummy=pair_dummy,
            **rasterize_kw,
        )
        rendered = render[..., :3]
        if batch.sampling_mask is not None:
            # Gate gradients by the dataset sampling mask: forward values
            # unchanged, masked-out pixels contribute no gradient
            # (reference method.py:439-443).
            m = batch.sampling_mask.astype(rendered.dtype)
            rendered = rendered * m + jax.lax.stop_gradient(rendered) * (1 - m)
            alpha = alpha * m + jax.lax.stop_gradient(alpha) * (1 - m)
        if cfg.use_bilateral_grid and aux.grids is not None:
            rendered = slice_bilateral_grid(
                aux.grids, rendered, batch.image_ids
            )
        # random_bkgd: bkgd is composited into the render via
        # rasterize(backgrounds=bkgd); GT pixels stay raw (reference
        # runner.py:493-495 adds bkgd*(1-alpha) only to the rendered side),
        # so the alpha gradient that suppresses floaters survives.
        pixels = batch.pixels

        l1 = jnp.mean(jnp.abs(rendered - pixels))
        ssim_val = ssim(rendered, pixels)
        loss = (1.0 - cfg.ssim_lambda) * l1 + cfg.ssim_lambda * (1.0 - ssim_val)

        if cfg.depth_loss and batch.depth_points is not None:
            # Sparse disparity loss against SfM depths (reference
            # runner.py:516-528).
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
            loss = loss + cfg.depth_lambda * (
                jnp.sum(jnp.abs(disp - disp_gt)) / nvalid
            )

        if cfg.use_bilateral_grid and aux.grids is not None:
            loss = loss + cfg.tv_lambda * total_variation_loss(aux.grids)

        if cfg.opacity_reg > 0.0:
            loss = loss + cfg.opacity_reg * jnp.mean(
                jnp.where(alive, jnp.abs(opacities), 0.0)
            )
        if cfg.scale_reg > 0.0:
            loss = loss + cfg.scale_reg * jnp.mean(
                jnp.where(alive[:, None], jnp.abs(scales), 0.0)
            )

        auxd = dict(
            l1=l1,
            ssim=ssim_val,
            radii=info.radii,
            overflow=info.overflow,
            alpha_mean=jnp.mean(alpha),
            binning=info.binning,
            pairs=(
                info.binning.tile_starts[-1]
                if info.binning is not None
                else jnp.int32(0)
            ),
        )
        return loss, auxd

    # Donating the big state trees lets XLA update Adam moments / params /
    # strategy stats in place instead of allocating fresh buffers each step
    # (callers rebind the returned state, never reusing the old objects).
    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4))
    def train_step(
        gstate: GaussianState,
        adam: AdamState,
        sstate,
        aux: AuxParams,
        aux_opt: AuxOptState,
        batch: Batch,
        step: jnp.ndarray,
        key: jax.Array,
    ):
        c = batch.pixels.shape[0]
        dummy = jnp.zeros((c, gstate.params.capacity, 2), jnp.float32)
        pair_dummy = (
            jnp.zeros((c * gstate.params.capacity, 2), jnp.float32)
            if use_absgrad
            else None
        )
        (loss, auxd), (grads, dgrads, pgrads, agrads) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2, 3), has_aux=True
        )(gstate.params, dummy, pair_dummy, aux, gstate.alive, batch, step, key)

        params, adam = adam_update(gstate.params, grads, adam, acfg, step)

        decay = acfg.means_decay_gamma ** step.astype(jnp.float32)
        new_aux, new_opt = {}, {}
        if aux.pose is not None:
            p, s = simple_adam_update(
                aux.pose, agrads.pose, aux_opt.pose,
                lr=cfg.pose_opt_lr * decay, weight_decay=cfg.pose_opt_reg,
            )
            new_aux["pose"], new_opt["pose"] = p, s
        if aux.app is not None:
            p, s = simple_adam_update(
                aux.app, agrads.app, aux_opt.app,
                lr=cfg.app_opt_lr, weight_decay=cfg.app_opt_reg,
            )
            new_aux["app"], new_opt["app"] = p, s
        if aux.grids is not None:
            p, s = simple_adam_update(
                aux.grids, agrads.grids, aux_opt.grids, lr=2e-3
            )
            new_aux["grids"], new_opt["grids"] = p, s
        aux = aux._replace(**new_aux)
        aux_opt = aux_opt._replace(**new_opt)

        if track_stats:
            if use_absgrad and auxd["binning"] is not None:
                # Per-gaussian sums of absolute per-pair screen grads
                # (gsplat's absgrad mode) — sharper densification signal than
                # the net gradient when positive/negative contributions
                # cancel. The render op's pair_dummy cotangent delivers them
                # pre-reduced.
                stats_grads = pgrads.reshape(c, -1, 2)
            else:
                stats_grads = dgrads
            sstate = default_strategy.update_state(
                sstate, stats_grads, auxd["radii"], width, height
            )
        metrics = dict(
            loss=loss,
            l1=auxd["l1"],
            ssim=auxd["ssim"],
            overflow=auxd["overflow"],
            alpha_mean=auxd["alpha_mean"],
            pairs=auxd["pairs"],
        )
        return gstate._replace(params=params), adam, sstate, aux, aux_opt, metrics

    return train_step
