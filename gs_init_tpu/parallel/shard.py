"""Multi-device training: gaussian-sharded projection + camera-data-parallel
rasterization over a 2-D device mesh.

TPU-native replacement for the reference's NCCL setup (gsplat.distributed.cli
process-per-GPU launcher + distributed=True rasterization all-to-all,
trainer.py:58 / runner.py:359). Design per SURVEY.md §5.8:

- mesh axes ("data", "gauss"): cameras are sharded over "data", gaussian
  buffers over "gauss".
- each device projects *its gaussian shard* for *its cameras* (projection +
  SH are the FLOP-heavy parts and scale 1/gauss_shards)
- the compact screen-space attributes (10 floats/gaussian) are all-gathered
  along "gauss" over ICI — far cheaper than exchanging raw params — then
  binning + Pallas compositing run locally per camera
- jax.grad inside shard_map transposes the all_gather into a reduce-scatter
  automatically, so per-shard parameter gradients come out local
- the loss is psum'd over "data"; Adam/densification run under plain jit on
  the sharded global arrays (XLA GSPMD partitions the elementwise math).

Feature parity with the single-device step (engine/train_step.py), each
exact-parity-tested on the virtual CPU mesh (tests/test_parallel.py): pose /
appearance / bilateral-grid aux groups (DDP-replicated, like the reference's
DDP modules at runner.py:227-284; appearance per-gaussian features are
sliced per shard inside the step), absgrad pair taps, sparse depth loss,
random background, sampling masks, opacity/scale regularizers. MCMC
relocation and DefaultStrategy refine run under plain jit on the
GSPMD-sharded buffers (see tests).

Single-chip training is the mesh=(1,1) special case of the same code.
"""
from __future__ import annotations

import os as _os

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.appearance import (
    appearance_colors,
    apply_pose_deltas,
    slice_bilateral_grid,
    total_variation_loss,
)
from ..engine.optim import AdamConfig, adam_update, simple_adam_update
from ..engine.params import GaussianState
from ..engine.strategy import default as default_strategy
from ..engine.train_step import AuxOptState, AuxParams, Batch, sh_coeff_mask
from ..ops.projection import project_gaussians, Projected
from ..ops.rasterize import render_tiles, unpack_tiles
from ..ops.rasterize_ref import rasterize_reference
from ..ops.sh import sh_to_color
from ..ops.ssim import ssim
from ..ops.tiles import bin_gaussians, pack_table


def make_mesh(n_data: int, n_gauss: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_data * n_gauss, (
        f"need {n_data * n_gauss} devices, have {devices.size}"
    )
    return Mesh(
        devices[: n_data * n_gauss].reshape(n_data, n_gauss), ("data", "gauss")
    )


def shardings(mesh: Mesh):
    """NamedShardings for (gaussian buffers, camera batch, replicated)."""
    gauss = NamedSharding(mesh, P("gauss"))
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    return gauss, data, repl


def make_sharded_train_step(
    cfg, acfg: AdamConfig, width: int, height: int, mesh: Mesh
):
    """Build the pjit'd multi-device train step.

    Same signature/returns as the single-device step: (gstate, adam, sstate,
    aux, aux_opt, batch, step, key) -> (gstate', adam', sstate', aux',
    aux_opt', metrics). Gaussian buffers sharded along axis 0 over "gauss",
    batch arrays along axis 0 over "data" (batch divisible by the data
    axis); aux groups replicated.
    """
    n_data = mesh.shape["data"]
    n_gauss = mesh.shape["gauss"]
    use_pallas = cfg.rasterizer_impl == "pallas" or (
        cfg.rasterizer_impl == "auto" and jax.default_backend() != "cpu"
    )
    # MCMC relocation never reads grad2d stats — skip the pair tap and the
    # stats accumulation (mirrors the single-device step's track_stats).
    track_stats = type(cfg.strategy).__name__ != "MCMCStrategyConfig"
    use_absgrad = bool(getattr(cfg.strategy, "absgrad", False)) and track_stats
    want_depth = bool(cfg.depth_loss)

    def local_loss(params, dummy, pair_dummy, aux: AuxParams, alive,
                   batch: Batch, step, key):
        """Runs per-device inside shard_map. params/alive: gaussian shard;
        batch: local cameras; aux: replicated; dummy: [C_local, N_local, 2];
        pair_dummy: [C_local * N_global, 2] or None."""
        n_local = params.means.shape[0]
        c_local = batch.pixels.shape[0]
        gi = jax.lax.axis_index("gauss")
        scales, opacities = params.activated()

        c2w = batch.camtoworlds
        if cfg.pose_opt and aux.pose is not None:
            c2w = apply_pose_deltas(c2w, aux.pose, batch.image_ids)
        viewmats = jnp.linalg.inv(c2w)

        bkgd = None
        if cfg.random_bkgd:
            # Same key everywhere; slice this data-shard's cameras out of
            # the full-batch draw so colors match the single-device step.
            di = jax.lax.axis_index("data")
            full = jax.random.uniform(key, (n_data * c_local, 3))
            bkgd = jax.lax.dynamic_slice_in_dim(
                full, di * c_local, c_local, axis=0
            )
        elif getattr(cfg, "background_color", None) is not None:
            bkgd = jnp.tile(
                jnp.asarray(cfg.background_color, jnp.float32)[None],
                (c_local, 1),
            )

        proj = project_gaussians(
            params.means, params.quats, scales, opacities,
            viewmats, batch.Ks, width, height,
            near_plane=cfg.near_plane, far_plane=cfg.far_plane,
            antialiased=cfg.antialiased, camera_model=cfg.camera_model,
            alive=alive,
        )
        centers = c2w[:, :3, 3]
        dirs = params.means[None, :, :] - centers[:, None, :]
        if cfg.app_opt and aux.app is not None:
            feats_shard = jax.lax.dynamic_slice_in_dim(
                aux.app.features, gi * n_local, n_local, axis=0
            )
            active_deg = jnp.minimum(
                step // cfg.sh_degree_interval, cfg.sh_degree
            )
            resid = appearance_colors(
                aux.app._replace(features=feats_shard),
                batch.image_ids, dirs, active_deg, cfg.sh_degree,
            )
            colors = jax.nn.sigmoid(resid + params.sh0[None, :, 0, :])
        else:
            sh = params.sh_coeffs()
            mask = sh_coeff_mask(step, cfg.sh_degree, cfg.sh_degree_interval)
            sh = sh.at[:, 1:, :].multiply(mask[None, :, None])
            colors = sh_to_color(
                jnp.broadcast_to(sh[None], (c_local,) + sh.shape),
                dirs, cfg.sh_degree,
            )
        means2d = proj.means2d + dummy

        # Gather the compact projected attributes across gaussian shards.
        gather = lambda x: jax.lax.all_gather(x, "gauss", axis=1, tiled=True)
        means2d = gather(means2d)
        conics = gather(proj.conics)
        depths = gather(proj.depths)
        radii = gather(proj.radii)
        opac2d = gather(proj.opacities)
        colors = gather(colors)
        extents = gather(proj.extents)

        overflow = jnp.int32(0)
        pairs = jnp.int32(0)
        if use_pallas:
            binning = bin_gaussians(
                means2d, radii, depths, width, height,
                cfg.tile_size, cfg.pair_capacity, chunk=cfg.chunk_size,
                reorder_rows=getattr(cfg, "reorder_table", False),
                extents=extents,
            )
            overflow = binning.overflow
            pairs = binning.tile_starts[-1]
            table = pack_table(means2d, conics, opac2d, colors, depths)
            num_tiles = c_local * binning.num_tiles_x * binning.num_tiles_y
            pd = (
                pair_dummy
                if pair_dummy is not None
                else jnp.zeros((table.shape[0], 2), jnp.float32)
            )
            out = render_tiles(
                table, pd,
                binning.gid_sorted, binning.row_order,
                binning.tile_starts, binning.out_starts,
                binning.gauss_offsets, binning.gauss_counts,
                num_tiles, binning.num_tiles_x, binning.num_tiles_y,
                cfg.tile_size, cfg.chunk_size, want_depth, use_absgrad,
                getattr(cfg, "sort_bf16", False),
                getattr(cfg, "wire8", None)
                if getattr(cfg, "wire8", None) is not None
                else _os.environ.get("GS_WIRE", "8") == "8",
            )
            color, alpha, depth_acc = unpack_tiles(
                out, c_local, binning.num_tiles_x, binning.num_tiles_y,
                cfg.tile_size, width, height,
            )
        else:
            full = Projected(
                means2d=means2d, conics=conics, depths=depths,
                radii=radii, opacities=opac2d, extents=extents,
            )
            color, alpha, depth_acc = rasterize_reference(
                full, colors, width, height, tile_size=cfg.tile_size
            )

        if bkgd is not None:
            color = color + (1.0 - alpha)[..., None] * bkgd[:, None, None, :]

        rendered = color
        if batch.sampling_mask is not None:
            m = batch.sampling_mask.astype(rendered.dtype)
            rendered = rendered * m + jax.lax.stop_gradient(rendered) * (1 - m)
            alpha = alpha * m[..., 0] + jax.lax.stop_gradient(alpha) * (
                1 - m[..., 0]
            )
        if cfg.use_bilateral_grid and aux.grids is not None:
            rendered = slice_bilateral_grid(
                aux.grids, rendered, batch.image_ids
            )

        l1 = jnp.mean(jnp.abs(rendered - batch.pixels))
        ssim_val = ssim(rendered, batch.pixels)
        loss_local = (1.0 - cfg.ssim_lambda) * l1 + cfg.ssim_lambda * (
            1.0 - ssim_val
        )

        if want_depth and batch.depth_points is not None:
            depth = depth_acc / jnp.maximum(alpha, 1e-10)
            pts = batch.depth_points.astype(jnp.int32)
            b_idx = jnp.arange(c_local)[:, None]
            sampled = depth[b_idx, pts[..., 1], pts[..., 0]]
            valid = batch.depth_values > 0
            disp = jnp.where(valid, 1.0 / jnp.maximum(sampled, 1e-6), 0.0)
            disp_gt = jnp.where(
                valid, 1.0 / jnp.maximum(batch.depth_values, 1e-6), 0.0
            )
            # Normalize by the GLOBAL valid count so pmean over data
            # reproduces the single-device sum/nvalid exactly.
            nv = jax.lax.psum(
                jnp.sum(valid).astype(jnp.float32), "data"
            )
            nv = jnp.maximum(jax.lax.stop_gradient(nv), 1.0)
            loss_local = loss_local + cfg.depth_lambda * n_data * (
                jnp.sum(jnp.abs(disp - disp_gt)) / nv
            )

        if cfg.use_bilateral_grid and aux.grids is not None:
            loss_local = loss_local + cfg.tv_lambda * total_variation_loss(
                aux.grids
            )

        # Regularizers over the full capacity: psum the shard sums so the
        # local loss stays identical across gauss devices (the grad
        # normalization below depends on that replication).
        cap_total = n_local * n_gauss
        if cfg.opacity_reg > 0.0:
            s = jnp.sum(jnp.where(alive, jnp.abs(opacities), 0.0))
            loss_local = loss_local + cfg.opacity_reg * (
                jax.lax.psum(s, "gauss") / cap_total
            )
        if cfg.scale_reg > 0.0:
            s = jnp.sum(jnp.where(alive[:, None], jnp.abs(scales), 0.0))
            loss_local = loss_local + cfg.scale_reg * (
                jax.lax.psum(s, "gauss") / (cap_total * 3)
            )

        return loss_local, dict(
            l1=l1, ssim=ssim_val, radii=radii,
            overflow=overflow, pairs=pairs, alpha_mean=jnp.mean(alpha),
        )

    def device_step(params, alive, aux: AuxParams, batch, step, key):
        c_local = batch.pixels.shape[0]
        n_local = params.means.shape[0]
        dummy = jnp.zeros((c_local, n_local, 2), jnp.float32)
        pair_dummy = (
            jnp.zeros((c_local * n_local * n_gauss, 2), jnp.float32)
            if (use_absgrad and use_pallas)
            else None
        )
        (loss_local, auxd), (grads, dgrads, pgrads, agrads) = (
            jax.value_and_grad(local_loss, argnums=(0, 1, 2, 3), has_aux=True)(
                params, dummy, pair_dummy, aux, alive, batch, step, key
            )
        )
        loss = jax.lax.pmean(loss_local, ("data", "gauss"))
        # Local grads arrive n_gauss-fold (every gauss-shard device computed
        # the same replicated loss; the all_gather transpose psum-scatters
        # their identical cotangents). The global loss is additionally the
        # *mean* over the data axis of local losses, so:
        #   d(global)/d(shard) = psum_data(local grads) / (n_data * n_gauss)
        norm = 1.0 / (n_data * n_gauss)
        grads = jax.tree.map(
            lambda g: jax.lax.psum(g, "data") * norm, grads
        )
        dgrads = dgrads * norm
        # Aux groups are replicated; their cotangents include the routed
        # cross-shard contributions, so reduce over BOTH axes.
        agrads = jax.tree.map(
            lambda g: jax.lax.psum(g, ("data", "gauss")) * norm, agrads
        )
        gi = jax.lax.axis_index("gauss")
        radii_local = jax.lax.dynamic_slice_in_dim(
            auxd["radii"], gi * n_local, n_local, axis=1
        )
        if pgrads is not None:
            # Pair taps never cross a collective: 1-fold per device, and
            # identical across gauss devices (same gathered binning) — slice
            # this shard's columns and scale by the data-mean factor only.
            stats_local = pgrads.reshape(c_local, n_local * n_gauss, 2)
            stats_local = jax.lax.dynamic_slice_in_dim(
                stats_local, gi * n_local, n_local, axis=1
            ) * (1.0 / n_data)
        else:
            stats_local = dgrads
        l1 = jax.lax.pmean(auxd["l1"], "data")
        ssim_val = jax.lax.pmean(auxd["ssim"], "data")
        # Pair capacity is PER data-shard: report the worst shard so the
        # runner's auto-retune sizes the capacity for it (Weak #5: sharded
        # overflow must not be silent).
        scalars = dict(
            overflow=jax.lax.pmax(auxd["overflow"], "data"),
            pairs=jax.lax.pmax(auxd["pairs"], "data"),
            alpha_mean=jax.lax.pmean(auxd["alpha_mean"], "data"),
        )
        return (
            loss, grads, dgrads, agrads, stats_local, radii_local, l1,
            ssim_val, scalars,
        )

    from jax import shard_map

    smapped = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(
            P("gauss"),  # params (axis 0 of every leaf)
            P("gauss"),  # alive
            P(),  # aux (replicated)
            P("data"),  # batch leaves (axis 0)
            P(),  # step
            P(),  # key
        ),
        out_specs=(
            P(),
            P("gauss"),
            P("data", "gauss"),
            P(),  # aux grads (already reduced)
            P("data", "gauss"),  # densification stats grads
            P("data", "gauss"),  # radii
            P(),
            P(),
            P(),  # scalar telemetry (overflow/pairs/alpha_mean)
        ),
        check_vma=False,
    )

    @jax.jit
    def train_step(
        gstate: GaussianState, adam, sstate, aux: AuxParams,
        aux_opt: AuxOptState, batch: Batch, step, key,
    ):
        (
            loss, grads, dgrads, agrads, stats, radii, l1, ssim_val, scalars,
        ) = smapped(gstate.params, gstate.alive, aux, batch, step, key)
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
            sstate = default_strategy.update_state(
                sstate, stats, radii, width, height
            )
        metrics = dict(loss=loss, l1=l1, ssim=ssim_val, **scalars)
        return gstate._replace(params=params), adam, sstate, aux, aux_opt, metrics

    return train_step


def make_band_sharded_train_step(
    cfg, acfg: AdamConfig, width: int, height: int, mesh: Mesh
):
    """Pixel-band parallel train step: the "data" axis shards horizontal
    TILE-ROW BANDS of every image (batch replicated on all devices), the
    "gauss" axis shards projection/SH/Adam as in make_sharded_train_step.

    This is the multi-chip configuration for the reference's real operating
    point (one camera per step, millions of gaussians,
    nerfbaselines_evaluator.py:514-524): camera data-parallelism cannot
    shard the dominant binning+compositing cost at batch_size=1, band
    parallelism divides it by the data axis. Each device culls the gathered
    gaussians to its band, bins and composites a band-local image, and the
    bands are all-gathered (an image-sized transfer, ~4 MB at garden scale
    — orders of magnitude below the gaussian all_gather) for a REPLICATED
    full-image loss, so SSIM windows never straddle band boundaries.
    Enabled via cfg.shard_pixels (Config) through the Runner.
    """
    n_data = mesh.shape["data"]
    n_gauss = mesh.shape["gauss"]
    use_pallas = cfg.rasterizer_impl == "pallas" or (
        cfg.rasterizer_impl == "auto" and jax.default_backend() != "cpu"
    )
    track_stats = type(cfg.strategy).__name__ != "MCMCStrategyConfig"
    use_absgrad = bool(getattr(cfg.strategy, "absgrad", False)) and track_stats
    want_depth = bool(cfg.depth_loss)
    tile = cfg.tile_size
    nty = -(-height // tile)
    band_ty = -(-nty // n_data)
    band_h = band_ty * tile  # per-device band height (padded rows masked)

    def local_loss(params, dummy, pair_dummy, aux: AuxParams, alive,
                   batch: Batch, step, key):
        n_local = params.means.shape[0]
        c = batch.pixels.shape[0]
        gi = jax.lax.axis_index("gauss")
        di = jax.lax.axis_index("data")
        scales, opacities = params.activated()

        c2w = batch.camtoworlds
        if cfg.pose_opt and aux.pose is not None:
            c2w = apply_pose_deltas(c2w, aux.pose, batch.image_ids)
        viewmats = jnp.linalg.inv(c2w)

        bkgd = None
        if cfg.random_bkgd:
            bkgd = jax.random.uniform(key, (c, 3))  # replicated draw
        elif getattr(cfg, "background_color", None) is not None:
            bkgd = jnp.tile(
                jnp.asarray(cfg.background_color, jnp.float32)[None], (c, 1)
            )

        proj = project_gaussians(
            params.means, params.quats, scales, opacities,
            viewmats, batch.Ks, width, height,
            near_plane=cfg.near_plane, far_plane=cfg.far_plane,
            antialiased=cfg.antialiased, camera_model=cfg.camera_model,
            alive=alive,
        )
        centers = c2w[:, :3, 3]
        dirs = params.means[None, :, :] - centers[:, None, :]
        if cfg.app_opt and aux.app is not None:
            feats_shard = jax.lax.dynamic_slice_in_dim(
                aux.app.features, gi * n_local, n_local, axis=0
            )
            active_deg = jnp.minimum(
                step // cfg.sh_degree_interval, cfg.sh_degree
            )
            resid = appearance_colors(
                aux.app._replace(features=feats_shard),
                batch.image_ids, dirs, active_deg, cfg.sh_degree,
            )
            colors = jax.nn.sigmoid(resid + params.sh0[None, :, 0, :])
        else:
            sh = params.sh_coeffs()
            mask = sh_coeff_mask(step, cfg.sh_degree, cfg.sh_degree_interval)
            sh = sh.at[:, 1:, :].multiply(mask[None, :, None])
            colors = sh_to_color(
                jnp.broadcast_to(sh[None], (c,) + sh.shape), dirs,
                cfg.sh_degree,
            )
        means2d = proj.means2d + dummy

        gather = lambda x: jax.lax.all_gather(x, "gauss", axis=1, tiled=True)
        means2d = gather(means2d)
        conics = gather(proj.conics)
        depths = gather(proj.depths)
        radii = gather(proj.radii)
        opac2d = gather(proj.opacities)
        colors = gather(colors)
        extents = gather(proj.extents)

        # Band-local frame: shift screen y, cull gaussians whose footprint
        # misses this device's tile-row band (clipped tile spans would
        # otherwise re-admit every off-band gaussian). The y test uses the
        # elliptical y-extent — same support bound binning uses.
        y0 = (di * band_h).astype(jnp.float32)
        rf = extents[..., 1].astype(jnp.float32)
        my = means2d[..., 1]
        in_band = (my + rf >= y0) & (my - rf < y0 + band_h)
        radii_b = jnp.where(in_band, radii, 0)
        extents_b = jnp.where(in_band[..., None], extents, 0)
        means2d_b = means2d - jnp.stack(
            [jnp.zeros_like(y0), y0]
        ).reshape(1, 1, 2)

        overflow = jnp.int32(0)
        pairs = jnp.int32(0)
        if use_pallas:
            binning = bin_gaussians(
                means2d_b, radii_b, depths, width, band_h,
                cfg.tile_size, cfg.pair_capacity, chunk=cfg.chunk_size,
                reorder_rows=getattr(cfg, "reorder_table", False),
                extents=extents_b,
            )
            overflow = binning.overflow
            pairs = binning.tile_starts[-1]
            table = pack_table(means2d_b, conics, opac2d, colors, depths)
            num_tiles = c * binning.num_tiles_x * binning.num_tiles_y
            pd = (
                pair_dummy
                if pair_dummy is not None
                else jnp.zeros((table.shape[0], 2), jnp.float32)
            )
            out = render_tiles(
                table, pd,
                binning.gid_sorted, binning.row_order,
                binning.tile_starts, binning.out_starts,
                binning.gauss_offsets, binning.gauss_counts,
                num_tiles, binning.num_tiles_x, binning.num_tiles_y,
                cfg.tile_size, cfg.chunk_size, want_depth, use_absgrad,
                getattr(cfg, "sort_bf16", False),
                getattr(cfg, "wire8", None)
                if getattr(cfg, "wire8", None) is not None
                else _os.environ.get("GS_WIRE", "8") == "8",
            )
            color, alpha, depth_acc = unpack_tiles(
                out, c, binning.num_tiles_x, binning.num_tiles_y,
                cfg.tile_size, width, band_h,
            )
        else:
            band = Projected(
                means2d=means2d_b, conics=conics, depths=depths,
                radii=radii_b, opacities=opac2d, extents=extents_b,
            )
            color, alpha, depth_acc = rasterize_reference(
                band, colors, width, band_h, tile_size=cfg.tile_size
            )

        # Assemble the full image from the bands (image-sized all_gather;
        # its transpose hands each device its band's cotangent slice) and
        # run the EXACT single-device loss on it, replicated.
        gb = lambda x: jax.lax.all_gather(x, "data", axis=1, tiled=True)
        color = gb(color)[:, :height]
        alpha = gb(alpha)[:, :height]
        depth_acc = gb(depth_acc)[:, :height]

        if bkgd is not None:
            color = color + (1.0 - alpha)[..., None] * bkgd[:, None, None, :]

        rendered = color
        if batch.sampling_mask is not None:
            m = batch.sampling_mask.astype(rendered.dtype)
            rendered = rendered * m + jax.lax.stop_gradient(rendered) * (1 - m)
            alpha = alpha * m[..., 0] + jax.lax.stop_gradient(alpha) * (
                1 - m[..., 0]
            )
        if cfg.use_bilateral_grid and aux.grids is not None:
            rendered = slice_bilateral_grid(
                aux.grids, rendered, batch.image_ids
            )

        l1 = jnp.mean(jnp.abs(rendered - batch.pixels))
        ssim_val = ssim(rendered, batch.pixels)
        loss_local = (1.0 - cfg.ssim_lambda) * l1 + cfg.ssim_lambda * (
            1.0 - ssim_val
        )

        if want_depth and batch.depth_points is not None:
            depth = depth_acc / jnp.maximum(alpha, 1e-10)
            pts = batch.depth_points.astype(jnp.int32)
            b_idx = jnp.arange(c)[:, None]
            sampled = depth[b_idx, pts[..., 1], pts[..., 0]]
            valid = batch.depth_values > 0
            disp = jnp.where(valid, 1.0 / jnp.maximum(sampled, 1e-6), 0.0)
            disp_gt = jnp.where(
                valid, 1.0 / jnp.maximum(batch.depth_values, 1e-6), 0.0
            )
            nvalid = jnp.maximum(jnp.sum(valid), 1)
            loss_local = loss_local + cfg.depth_lambda * (
                jnp.sum(jnp.abs(disp - disp_gt)) / nvalid
            )

        if cfg.use_bilateral_grid and aux.grids is not None:
            loss_local = loss_local + cfg.tv_lambda * total_variation_loss(
                aux.grids
            )

        cap_total = n_local * n_gauss
        if cfg.opacity_reg > 0.0:
            s = jnp.sum(jnp.where(alive, jnp.abs(opacities), 0.0))
            loss_local = loss_local + cfg.opacity_reg * (
                jax.lax.psum(s, "gauss") / cap_total
            )
        if cfg.scale_reg > 0.0:
            s = jnp.sum(jnp.where(alive[:, None], jnp.abs(scales), 0.0))
            loss_local = loss_local + cfg.scale_reg * (
                jax.lax.psum(s, "gauss") / (cap_total * 3)
            )

        return loss_local, dict(
            l1=l1, ssim=ssim_val, radii=radii,
            overflow=overflow, pairs=pairs, alpha_mean=jnp.mean(alpha),
        )

    def device_step(params, alive, aux: AuxParams, batch, step, key):
        c = batch.pixels.shape[0]
        n_local = params.means.shape[0]
        dummy = jnp.zeros((c, n_local, 2), jnp.float32)
        pair_dummy = (
            jnp.zeros((c * n_local * n_gauss, 2), jnp.float32)
            if (use_absgrad and use_pallas)
            else None
        )
        (loss_local, auxd), (grads, dgrads, pgrads, agrads) = (
            jax.value_and_grad(local_loss, argnums=(0, 1, 2, 3), has_aux=True)(
                params, dummy, pair_dummy, aux, alive, batch, step, key
            )
        )
        loss = jax.lax.pmean(loss_local, ("data", "gauss"))
        # Fold factors: every device computes the identical full-image
        # loss; the band all_gather transpose psum-scatters d identical
        # cotangents onto each band, the gaussian all_gather transpose
        # psum-scatters g more — so per-device shard grads are its band's
        # contribution x (d*g), and psum over data / (d*g) recovers the
        # exact total (same normalization as the camera-sharded step).
        norm = 1.0 / (n_data * n_gauss)
        grads = jax.tree.map(
            lambda g: jax.lax.psum(g, "data") * norm, grads
        )
        agrads = jax.tree.map(
            lambda g: jax.lax.psum(g, ("data", "gauss")) * norm, agrads
        )
        gi = jax.lax.axis_index("gauss")
        # Radii are full-screen projections, identical across data devices.
        radii_local = jax.lax.dynamic_slice_in_dim(
            auxd["radii"], gi * n_local, n_local, axis=1
        )
        if pgrads is not None:
            # Pair taps see only this band's pairs, d-fold (no gauss
            # collective in their path): total per gaussian = psum over
            # data / d.
            stats_local = jax.lax.psum(pgrads, "data").reshape(
                c, n_local * n_gauss, 2
            )
            stats_local = jax.lax.dynamic_slice_in_dim(
                stats_local, gi * n_local, n_local, axis=1
            ) * (1.0 / n_data)
        else:
            # means2d tap rides the gauss gather: d*g-fold per band.
            stats_local = jax.lax.psum(dgrads, "data") * norm
        l1 = auxd["l1"]  # replicated
        ssim_val = auxd["ssim"]
        scalars = dict(
            overflow=jax.lax.pmax(auxd["overflow"], "data"),
            pairs=jax.lax.pmax(auxd["pairs"], "data"),
            alpha_mean=auxd["alpha_mean"],
        )
        # NOTE: raw dgrads is NOT returned — it is band-local (d*g-fold,
        # differs across the data axis), so exposing it under a replicated
        # out_spec would materialize one arbitrary band's gradient. Only
        # the psum-reduced stats_local leaves the shard_map.
        return (
            loss, grads, agrads, stats_local, radii_local, l1,
            ssim_val, scalars,
        )

    from jax import shard_map

    smapped = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(
            P("gauss"),  # params
            P("gauss"),  # alive
            P(),  # aux
            P(),  # batch REPLICATED (bands shard pixels, not cameras)
            P(),  # step
            P(),  # key
        ),
        out_specs=(
            P(),
            P("gauss"),
            P(),
            P(None, "gauss"),  # stats (summed over bands, shard columns)
            P(None, "gauss"),  # radii
            P(),
            P(),
            P(),
        ),
        check_vma=False,
    )

    @jax.jit
    def train_step(
        gstate: GaussianState, adam, sstate, aux: AuxParams,
        aux_opt: AuxOptState, batch: Batch, step, key,
    ):
        (
            loss, grads, agrads, stats, radii, l1, ssim_val, scalars,
        ) = smapped(gstate.params, gstate.alive, aux, batch, step, key)
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
            sstate = default_strategy.update_state(
                sstate, stats, radii, width, height
            )
        metrics = dict(loss=loss, l1=l1, ssim=ssim_val, **scalars)
        return gstate._replace(params=params), adam, sstate, aux, aux_opt, metrics

    return train_step
