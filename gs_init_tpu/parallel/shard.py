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

Single-chip training is the mesh=(1,1) special case of the same code.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.optim import AdamConfig, adam_update
from ..engine.params import GaussianState
from ..engine.strategy import default as default_strategy
from ..engine.train_step import Batch, sh_coeff_mask
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


def make_sharded_train_step(cfg, acfg: AdamConfig, width: int, height: int, mesh: Mesh):
    """Build the pjit'd multi-device train step.

    Expects gaussian buffers sharded along axis 0 over "gauss", batch arrays
    sharded along axis 0 over "data" (batch size divisible by the data axis).
    """
    n_data = mesh.shape["data"]
    use_pallas = cfg.rasterizer_impl == "pallas" or (
        cfg.rasterizer_impl == "auto" and jax.default_backend() != "cpu"
    )

    def local_loss(params, dummy, alive, batch: Batch, step, key):
        """Runs per-device inside shard_map. params/alive: gaussian shard;
        batch: local cameras; dummy: [C_local, N_local, 2]."""
        scales, opacities = params.activated()
        sh = params.sh_coeffs()
        mask = sh_coeff_mask(step, cfg.sh_degree, cfg.sh_degree_interval)
        sh = sh.at[:, 1:, :].multiply(mask[None, :, None])
        viewmats = jnp.linalg.inv(batch.camtoworlds)

        proj = project_gaussians(
            params.means, params.quats, scales, opacities,
            viewmats, batch.Ks, width, height,
            near_plane=cfg.near_plane, far_plane=cfg.far_plane,
            antialiased=cfg.antialiased, camera_model=cfg.camera_model,
            alive=alive,
        )
        centers = -jnp.einsum(
            "cji,cj->ci", viewmats[:, :3, :3], viewmats[:, :3, 3]
        )
        dirs = params.means[None, :, :] - centers[:, None, :]
        colors = sh_to_color(
            jnp.broadcast_to(sh[None], (viewmats.shape[0],) + sh.shape),
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

        if use_pallas:
            binning = bin_gaussians(
                means2d, radii, depths, width, height,
                cfg.tile_size, cfg.pair_capacity, chunk=cfg.chunk_size,
            )
            table = pack_table(means2d, conics, opac2d, colors, depths)
            num_cams = viewmats.shape[0]
            num_tiles = num_cams * binning.num_tiles_x * binning.num_tiles_y
            out = render_tiles(
                table, jnp.zeros((table.shape[0], 2), jnp.float32),
                binning.gid_sorted, binning.tile_starts, binning.out_starts,
                binning.gauss_offsets, binning.gauss_counts,
                num_tiles, binning.num_tiles_x, binning.num_tiles_y,
                cfg.tile_size, cfg.chunk_size, False, False,
            )
            color, alpha, _ = unpack_tiles(
                out, num_cams, binning.num_tiles_x, binning.num_tiles_y,
                cfg.tile_size, width, height,
            )
        else:
            full = Projected(
                means2d=means2d, conics=conics, depths=depths,
                radii=radii, opacities=opac2d,
            )
            color, alpha, _ = rasterize_reference(
                full, colors, width, height, tile_size=cfg.tile_size
            )

        l1 = jnp.mean(jnp.abs(color - batch.pixels))
        ssim_val = ssim(color, batch.pixels)
        loss_local = (1.0 - cfg.ssim_lambda) * l1 + cfg.ssim_lambda * (
            1.0 - ssim_val
        )
        # Purely local loss — cross-device normalization is applied to the
        # gradients explicitly in device_step (collective transposes inside
        # unchecked shard_map do not carry pmean's 1/n factor).
        return loss_local, dict(l1=l1, ssim=ssim_val, radii=radii)

    def device_step(params, alive, batch, step, key):
        c_local = batch.pixels.shape[0]
        n_local = params.means.shape[0]
        n_gauss = jax.lax.axis_size("gauss")
        dummy = jnp.zeros((c_local, n_local, 2), jnp.float32)
        (loss_local, aux), (grads, dgrads) = jax.value_and_grad(
            local_loss, argnums=(0, 1), has_aux=True
        )(params, dummy, alive, batch, step, key)
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
        # Per-(camera, shard-gaussian) screen grads / radii for densification
        # stats; reassembled to global [C, N] by the out_specs.
        gi = jax.lax.axis_index("gauss")
        radii_local = jax.lax.dynamic_slice_in_dim(
            aux["radii"], gi * n_local, n_local, axis=1
        )
        l1 = jax.lax.pmean(aux["l1"], "data")
        ssim_val = jax.lax.pmean(aux["ssim"], "data")
        return loss, grads, dgrads, radii_local, l1, ssim_val

    from jax import shard_map

    smapped = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(
            P("gauss"),  # params (axis 0 of every leaf)
            P("gauss"),  # alive
            P("data"),  # batch leaves (axis 0)
            P(),  # step
            P(),  # key
        ),
        out_specs=(
            P(),
            P("gauss"),
            P("data", "gauss"),
            P("data", "gauss"),
            P(),
            P(),
        ),
        check_vma=False,
    )

    @jax.jit
    def train_step(gstate: GaussianState, adam, sstate, batch: Batch, step, key):
        loss, grads, dgrads, radii, l1, ssim_val = smapped(
            gstate.params, gstate.alive, batch, step, key
        )
        params, adam = adam_update(gstate.params, grads, adam, acfg, step)
        sstate = default_strategy.update_state(sstate, dgrads, radii, width, height)
        metrics = dict(loss=loss, l1=l1, ssim=ssim_val)
        return gstate._replace(params=params), adam, sstate, metrics

    return train_step
