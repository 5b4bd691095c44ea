"""Training runner: host-side orchestration around the jitted train step.

The reference's Runner (runner.py:141-900) is a monolithic class whose train
loop had to be split by AST surgery for nerfbaselines embedding
(nerfbaselines_integration/method.py:345-547). This engine is factored from
the start: ``setup_train`` / ``train_iteration`` / ``save`` / ``eval`` /
``render`` / ``render_traj`` are first-class methods; ``train()`` is just a
loop over them. All device math lives in jitted functions; this class only
does IO, logging, checkpointing and refine-schedule decisions.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, DefaultStrategyConfig, MCMCStrategyConfig
from ..config.config import to_dict
from ..datasets.parser import Dataset, Parser
from ..ops.render import rasterize
from ..ops.ssim import psnr, ssim
from .appearance import (
    apply_pose_deltas,
    color_correct,
    init_appearance_params,
    init_bilateral_grids,
    init_pose_params,
)
from .optim import init_adam_state, make_adam_config
from .params import GaussianState, init_from_points, init_random, num_alive
from .strategy import default as dstrat
from .strategy import mcmc as mcmc_strat
from .train_step import AuxParams, Batch, init_aux_opt, make_train_step


def resolve_mesh(cfg) -> "tuple[int, int] | None":
    """Decide the (data, gauss) mesh shape from cfg.mesh and the visible
    devices; None means the single-device step (see config.Config.mesh)."""
    if cfg.mesh == "off":
        return None
    if cfg.mesh == "auto":
        n_dev = len(jax.devices())
        if n_dev <= 1:
            return None
        if cfg.shard_pixels:
            # Bands scale the dominant binning+compositing cost; gaussians
            # stay replicated unless explicitly sharded via "DxG".
            return n_dev, 1
        import math

        n_data = math.gcd(cfg.batch_size, n_dev)
        return n_data, n_dev // n_data
    d, g = cfg.mesh.lower().split("x")
    return int(d), int(g)


class Runner:
    train_step: int = -1  # live progress read by the viewer /status endpoint
    viewer = None

    def __init__(
        self,
        cfg: Config,
        parser: Optional[Parser] = None,
        trainset: Optional[Dataset] = None,
        valset: Optional[Dataset] = None,
        mdi_model=None,  # optional pre-built depth predictor (tests/e2e)
    ):
        self.cfg = cfg
        self._mdi_model = mdi_model
        # Resolve the Pallas scan lowering NOW, before this process runs its
        # first jax op: the probe spawns a fresh interpreter that must
        # initialize the TPU, which fails (or hangs until its timeout) if
        # this process already holds the single-client chip. bench.py does
        # the same up-front; resolving it here keeps Runner entrypoints off
        # the mid-trace probe path.
        from ..ops.rasterize import _scan_mode

        _scan_mode()
        if parser is None:
            from ..datasets.nerfstudio import open_dataset

            parser = open_dataset(
                cfg.data_dir,
                factor=cfg.data_factor,
                normalize=cfg.normalize_world_space,
                test_every=cfg.test_every,
            )
        self.parser = parser
        cache_bytes = int(cfg.image_cache_gb * (1 << 30))
        self.trainset = trainset or Dataset(
            self.parser, "train", load_depths=cfg.depth_loss,
            patch_size=cfg.patch_size, cache_bytes=cache_bytes,
        )
        self.valset = valset or Dataset(
            self.parser, "val", cache_bytes=cache_bytes
        )
        self.scene_scale = self.parser.scene_scale * 1.1 * cfg.global_scale

        os.makedirs(cfg.result_dir, exist_ok=True)
        for sub in ["ckpts", "stats", "renders", "tb"]:
            os.makedirs(os.path.join(cfg.result_dir, sub), exist_ok=True)

        first = self.trainset[0]
        self.height, self.width = first["image"].shape[:2]

        # Multi-device: build the (data x gauss) mesh BEFORE any state so
        # the gaussian capacity can be rounded to the shard count. This is
        # the product path to multi-chip training (the reference launches
        # via gsplat.distributed.cli, trainer.py:58; ours is the mesh=(1,1)
        # single-device special case of the same engine).
        self.mesh = None
        self._shardings = None
        mesh_shape = resolve_mesh(cfg)
        if mesh_shape is not None and mesh_shape != (1, 1):
            from ..parallel.shard import make_mesh, shardings

            n_data, n_gauss = mesh_shape
            if not cfg.shard_pixels and cfg.batch_size % n_data:
                raise ValueError(
                    f"batch_size {cfg.batch_size} not divisible by the "
                    f"data mesh axis {n_data} (or set shard_pixels)"
                )
            if cfg.max_gaussians % n_gauss:
                new_cap = -(-cfg.max_gaussians // n_gauss) * n_gauss
                print(
                    f"[runner] rounding max_gaussians {cfg.max_gaussians} -> "
                    f"{new_cap} (divisible by {n_gauss} gaussian shards)"
                )
                cfg.max_gaussians = new_cap
            self.mesh = make_mesh(n_data, n_gauss)
            self._shardings = shardings(self.mesh)
            print(f"[runner] device mesh: {n_data} data x {n_gauss} gauss")

        self._init_gaussians()
        self.acfg = make_adam_config(cfg, self.scene_scale, cfg.batch_size)
        self.adam = init_adam_state(self.gstate.params)
        self._init_strategy()
        self._init_aux()
        self._place_state()
        self._build_step_fn()
        self.key = jax.random.PRNGKey(cfg.seed)
        self.global_step = 0
        # Per-phase wall-clock accounting (data loading vs device step).
        self._phase_times = {"data": 0.0, "step": 0.0}
        self._perm: List[int] = []
        self._writer = None

        with open(os.path.join(cfg.result_dir, "cfg.json"), "w") as f:
            json.dump(to_dict(cfg), f, indent=2, default=str)

    # ------------------------------------------------------------- set up

    def _init_points(self):
        cfg = self.cfg
        if cfg.init_type == "sfm":
            return self.parser.points, self.parser.points_rgb
        if cfg.init_type == "random":
            return None, None
        if cfg.init_type == "monocular_depth":
            from ..mdi.init import pts_and_rgb_from_monocular_depth

            pts, rgb = pts_and_rgb_from_monocular_depth(
                cfg, self.parser, model=self._mdi_model
            )
            return pts, rgb
        raise ValueError(f"unknown init_type {cfg.init_type!r}")

    def _init_gaussians(self):
        cfg = self.cfg
        pts, rgb = self._init_points()
        key = jax.random.PRNGKey(cfg.seed)
        if pts is None:
            self.gstate = init_random(
                key,
                cfg.init_num_pts,
                cfg.max_gaussians,
                extent=cfg.init_extent,
                scene_scale=self.scene_scale,
                sh_degree=cfg.sh_degree,
                init_opacity=cfg.init_opa,
                init_scale=cfg.init_scale,
            )
        else:
            if len(pts) > cfg.max_gaussians:
                print(
                    f"[runner] init points {len(pts)} exceed capacity "
                    f"{cfg.max_gaussians}; keeping a uniform random subset"
                )
            self.gstate = init_from_points(
                jnp.asarray(pts),
                jnp.asarray(rgb),
                cfg.max_gaussians,
                cfg.sh_degree,
                init_opacity=cfg.init_opa,
                init_scale=cfg.init_scale,
                rng=key,
                scale_clamp_quantile=(
                    cfg.mdi.scale_clamp_quantile
                    if cfg.init_type == "monocular_depth"
                    else 0.0
                ),
            )

    def _init_aux(self):
        cfg = self.cfg
        n_images = self.parser.num_images
        key = jax.random.PRNGKey(cfg.seed + 1)
        pose = init_pose_params(n_images) if cfg.pose_opt else None
        app = (
            init_appearance_params(
                key, n_images, cfg.max_gaussians,
                embed_dim=cfg.app_embed_dim, sh_degree=cfg.sh_degree,
            )
            if cfg.app_opt
            else None
        )
        grids = (
            init_bilateral_grids(n_images, cfg.bilateral_grid_shape)
            if cfg.use_bilateral_grid
            else None
        )
        self.aux = AuxParams(pose=pose, app=app, grids=grids)
        self.aux_opt = init_aux_opt(self.aux)
        # Pose-noise fault injection (reference config.py:165-166,
        # runner.py:241-245): fixed random SE3 perturbations on train poses.
        self._pose_perturb = None
        if cfg.pose_noise > 0:
            k = jax.random.PRNGKey(cfg.seed + 2)
            self._pose_perturb = init_pose_params(
                n_images, std=cfg.pose_noise, key=k
            )

    def _init_strategy(self):
        s = self.cfg.strategy
        if isinstance(s, DefaultStrategyConfig):
            self.sstate = dstrat.init_state(self.cfg.max_gaussians)
            self._strategy_kind = "default"
        elif isinstance(s, MCMCStrategyConfig):
            self.sstate = dstrat.init_state(self.cfg.max_gaussians)
            self._strategy_kind = "mcmc"
        else:
            raise ValueError(f"unknown strategy {s!r}")
        self._refine_jit = jax.jit(
            dstrat.refine, static_argnames=("scene_scale", "cfg")
        )
        self._reset_jit = jax.jit(dstrat.reset_opacities, static_argnames=("cfg",))
        self._relocate_jit = jax.jit(
            mcmc_strat.refine, static_argnames=("cfg",)
        )
        self._add_noise_jit = jax.jit(
            mcmc_strat.add_noise, static_argnames=("lr", "cfg")
        )

    def _build_step_fn(self):
        cfg = self.cfg
        if self.mesh is not None:
            if cfg.shard_pixels:
                from ..parallel.shard import make_band_sharded_train_step

                self.step_fn = make_band_sharded_train_step(
                    cfg, self.acfg, self.width, self.height, self.mesh
                )
            else:
                from ..parallel.shard import make_sharded_train_step

                self.step_fn = make_sharded_train_step(
                    cfg, self.acfg, self.width, self.height, self.mesh
                )
        else:
            self.step_fn = make_train_step(
                cfg, self.acfg, self.width, self.height
            )

    def _place_state(self):
        """Pin gaussian/optimizer/strategy state to the gauss axis and aux
        groups replicated. No-op without a mesh; re-invoked after refine /
        relocate so GSPMD output shardings never drift between steps."""
        if self.mesh is None:
            return
        gauss_s, _, repl_s = self._shardings
        put_g = lambda x: jax.device_put(x, gauss_s if x.ndim > 0 else repl_s)
        put_r = lambda x: jax.device_put(x, repl_s)
        self.gstate = jax.tree.map(put_g, self.gstate)
        self.adam = jax.tree.map(put_g, self.adam)
        self.sstate = jax.tree.map(put_g, self.sstate)
        self.aux = jax.tree.map(put_r, self.aux)
        self.aux_opt = jax.tree.map(put_r, self.aux_opt)

    @property
    def writer(self):
        if self._writer is None:
            from tensorboardX import SummaryWriter

            self._writer = SummaryWriter(os.path.join(self.cfg.result_dir, "tb"))
        return self._writer

    # -------------------------------------------------------------- train

    def _next_batch(self) -> Batch:
        cfg = self.cfg
        ids = []
        for _ in range(cfg.batch_size):
            if not self._perm:
                self.key, k = jax.random.split(self.key)
                self._perm = list(
                    np.asarray(
                        jax.random.permutation(k, len(self.trainset))
                    )
                )
            ids.append(int(self._perm.pop()))
        return self._build_batch(ids)

    def _build_batch(self, ids) -> Batch:
        """Assemble a device-ready batch from trainset indices.

        Thread-safe w.r.t. the train loop (called from the prefetch worker):
        reads only immutable state — datasets, the static pose perturbation,
        shardings.
        """
        cfg = self.cfg
        items = [self.trainset[i] for i in ids]
        c2ws = jnp.asarray(np.stack([it["camtoworld"] for it in items]))
        iid = jnp.asarray(np.array([it["image_id"] for it in items]))
        if self._pose_perturb is not None:
            c2ws = apply_pose_deltas(c2ws, self._pose_perturb, iid)
        batch = Batch(
            camtoworlds=c2ws,
            Ks=jnp.asarray(np.stack([it["K"] for it in items])),
            pixels=jnp.asarray(np.stack([it["image"] for it in items])),
            image_ids=iid,
        )
        if all("sampling_mask" in it for it in items):
            sm = np.stack(
                [np.asarray(it["sampling_mask"], np.float32) for it in items]
            )
            if sm.ndim == 3:
                sm = sm[..., None]
            batch = batch._replace(sampling_mask=jnp.asarray(sm))
        if cfg.depth_loss:
            m = max(len(it["depth_points"]) for it in items)
            m = max(m, 1)
            dp = np.zeros((len(items), m, 2), np.float32)
            dv = np.zeros((len(items), m), np.float32)
            for b, it in enumerate(items):
                k = len(it["depth_points"])
                dp[b, :k] = it["depth_points"][:m]
                dv[b, :k] = it["depth_values"][:m]
            batch = batch._replace(
                depth_points=jnp.asarray(dp), depth_values=jnp.asarray(dv)
            )
        if self.mesh is not None:
            _, data_s, repl_s = self._shardings
            # Band mode shards pixels, not cameras: batch is replicated.
            bs = repl_s if self.cfg.shard_pixels else data_s
            batch = jax.tree.map(lambda x: jax.device_put(x, bs), batch)
        return batch

    def setup_train(self):
        """Warm the compiled step (first call compiles)."""
        return self

    def _maybe_retune_capacity(self, metrics, step: int) -> None:
        """Right-size pair_capacity: every binning/pack pipeline runs at
        the static capacity, so a 4x oversized cap wastes ~2x step time
        (PERF.md). Recompile with a snug cap when observed pair counts are
        far from it (growth also handles overflow)."""
        cfg = self.cfg
        if not cfg.auto_pair_capacity or cfg.rasterizer_impl == "xla":
            return
        pairs = int(metrics.get("pairs", 0))
        overflow = int(metrics.get("overflow", 0))
        if pairs <= 0 and overflow <= 0:
            return
        # Snug cap: 1.2x headroom over the MAX pair count observed since the
        # last retune (sampled at tb cadence), rounded up to 64k. The max
        # absorbs cross-camera variance — retuning from a single camera's
        # count needed 1.35x blanket headroom, and every binning/sort/gather
        # pipeline pays for that cap every step. Overflow observed at a
        # sample grows the cap immediately (train() calls back in).
        peak = max(getattr(self, "_pairs_max", 0), pairs + overflow)
        self._pairs_max = 0  # restart the window after each retune decision
        gran = 1 << 16
        want = max(int(peak * 1.2), 1 << 14)
        want = -(-want // gran) * gran if want > gran else 1 << (want - 1).bit_length()
        cap = cfg.pair_capacity
        if overflow > 0 and want > cap:
            new_cap = want
        elif want < int(cap * 0.75):
            new_cap = max(want, 1 << 14)
        else:
            return
        print(
            f"[runner] retuning pair_capacity {cap} -> {new_cap} "
            f"(observed {pairs} pairs, overflow {overflow}) at step {step}"
        )
        cfg.pair_capacity = new_cap
        self._build_step_fn()

    def train_iteration(self, step: int) -> Dict[str, float]:
        cfg = self.cfg
        if cfg.profile_start >= 0 and step == cfg.profile_start:
            self._profile_dir = os.path.join(cfg.result_dir, "profile")
            jax.profiler.start_trace(self._profile_dir)
        t_data = time.time()
        pf = getattr(self, "_prefetcher", None)
        batch = pf.get() if pf is not None else self._next_batch()
        self._phase_times["data"] += time.time() - t_data
        self.key, k = jax.random.split(self.key)
        (
            self.gstate, self.adam, self.sstate, self.aux, self.aux_opt,
            metrics,
        ) = self.step_fn(
            self.gstate, self.adam, self.sstate, self.aux, self.aux_opt,
            batch, jnp.int32(step), k,
        )
        s = cfg.strategy
        if step == 0 or (step % s.refine_every == 0 and step > 0):
            self._maybe_retune_capacity(metrics, step)
        refined = False
        if self._strategy_kind == "default":
            # gsplat's DefaultStrategy.step_post_backward returns early once
            # step >= refine_stop_iter, so BOTH refine and opacity reset stop
            # there; pause_refine_after_reset skips grow/prune right after a
            # reset (gsplat default_strategy semantics).
            if step < s.refine_stop_iter:
                if (
                    step > s.refine_start_iter
                    and step % s.refine_every == 0
                    and step % s.reset_every >= s.pause_refine_after_reset
                ):
                    self.key, k = jax.random.split(self.key)
                    self.gstate, self.adam, self.sstate, _ = self._refine_jit(
                        self.gstate, self.adam, self.sstate, k,
                        self.scene_scale, s, jnp.int32(step),
                    )
                    refined = True
                if step % s.reset_every == 0 and step > 0:
                    self.gstate, self.adam = self._reset_jit(
                        self.gstate, self.adam, s
                    )
                    refined = True
        else:  # mcmc
            if (
                s.refine_start_iter < step < s.refine_stop_iter
                and step % s.refine_every == 0
            ):
                self.key, k = jax.random.split(self.key)
                self.gstate, self.adam, self.sstate = self._relocate_jit(
                    self.gstate, self.adam, self.sstate, k, s
                )
                refined = True
            self.key, k = jax.random.split(self.key)
            lr_now = float(
                self.acfg.lrs.means * self.acfg.means_decay_gamma**step
            )
            self.gstate = self._add_noise_jit(self.gstate, k, lr_now, s)
        if refined and self.mesh is not None:
            # Refine/relocate run under plain jit; GSPMD may emit outputs
            # with drifted shardings — pin them back to the gauss axis.
            self._place_state()
        if (
            cfg.profile_start >= 0
            and step == cfg.profile_start + cfg.profile_steps - 1
        ):
            jax.block_until_ready(metrics["loss"])
            jax.profiler.stop_trace()
            print(f"[profiler] trace written to {self._profile_dir}")
        self._phase_times["step"] += time.time() - t_data
        self.global_step = step
        return metrics

    def start_viewer(self) -> "int | None":
        """Attach the live HTTP viewer to this (possibly training) runner.

        Reference parity: runner.py:302-309 starts a viser/nerfview server
        before training and renders from the live splats between steps
        (runner.py:880-900). Rank-0 only; returns the bound port.
        """
        if jax.process_index() != 0:
            return None
        from ..viewer import ViewerServer

        self.viewer = ViewerServer(self, port=self.cfg.port)
        return self.viewer.start()

    def train(self):
        cfg = self.cfg
        if not cfg.disable_viewer and getattr(self, "viewer", None) is None:
            self.start_viewer()
        self._prefetcher = None
        if cfg.data_prefetch > 0:
            from ..datasets.prefetch import BatchPrefetcher

            self._prefetcher = BatchPrefetcher(
                self._build_batch,
                len(self.trainset),
                cfg.batch_size,
                depth=cfg.data_prefetch,
                seed=cfg.seed,
            )
        try:
            return self._train_loop()
        finally:
            if self._prefetcher is not None:
                self._prefetcher.close()
                self._prefetcher = None

    def _train_loop(self):
        cfg = self.cfg
        t0 = time.time()
        last_metrics = {}
        s_cfg = cfg.strategy
        for step in range(cfg.max_steps):
            self.train_step = step
            metrics = self.train_iteration(step)
            # Overflow blind-window guard: densify/relocate growth spurts
            # surface as pair-table overflow on the FIRST step after a
            # refine, which can sit between tb samples for up to tb_every
            # steps of silently dropped presort tails. One extra host sync
            # per refine cycle closes that window.
            if (
                step % s_cfg.refine_every == 1
                and s_cfg.refine_start_iter < step < s_cfg.refine_stop_iter + 2
                and int(metrics.get("overflow", 0)) > 0
            ):
                self._maybe_retune_capacity(metrics, step)
            if step % cfg.tb_every == 0:
                last_metrics = {k: float(v) for k, v in metrics.items()}
                # Feed the retune policy's cross-camera peak tracker from
                # the samples we already paid a host sync for; observed
                # overflow regrows the cap now instead of waiting for the
                # next refine boundary (overflow silently drops the presort
                # tail — whole gaussians' pairs).
                self._pairs_max = max(
                    getattr(self, "_pairs_max", 0),
                    int(last_metrics.get("pairs", 0))
                    + int(last_metrics.get("overflow", 0)),
                )
                if last_metrics.get("overflow", 0) > 0:
                    self._maybe_retune_capacity(metrics, step)
                w = self.writer
                for k, v in last_metrics.items():
                    w.add_scalar(f"train/{k}", v, step)
                w.add_scalar("train/num_GS", int(num_alive(self.gstate)), step)
                # Device memory for post-hoc table readback (the reference
                # tables pull GPU mem out of TB, parameters.py:10-30).
                from ..utils.mem import device_memory_stats

                mem = device_memory_stats()
                if mem:
                    w.add_scalar(
                        "train/mem_peak_gb",
                        mem["peak_bytes_in_use"] / 1024**3,
                        step,
                    )
                print(
                    f"step {step}: loss={last_metrics.get('loss', 0):.4f} "
                    f"num_GS={int(num_alive(self.gstate))}"
                )
            if step + 1 in cfg.save_steps or step + 1 == cfg.max_steps:
                self.save(step + 1)
            if cfg.save_ply and step + 1 in cfg.ply_steps:
                self.export_ply(step + 1)
            if step + 1 in cfg.eval_steps or step + 1 == cfg.max_steps:
                self.eval(step + 1)
                if cfg.compression is not None:
                    self.run_compression(step + 1)
        elapsed = time.time() - t0
        stats = dict(
            elapsed=elapsed,
            num_GS=int(num_alive(self.gstate)),
            data_time=self._phase_times["data"],
            step_time=self._phase_times["step"] - self._phase_times["data"],
            **last_metrics,
        )
        with open(
            os.path.join(cfg.result_dir, "stats", "train_final.json"), "w"
        ) as f:
            json.dump(stats, f, indent=2)
        return stats

    # ------------------------------------------------------------ render

    def render(
        self,
        camtoworld: np.ndarray,
        K: np.ndarray,
        width: int,
        height: int,
        render_mode: str = "RGB+ED",
        masks: "np.ndarray | None" = None,  # [H, W] bool pixel mask
    ):
        """Render one view; returns (color [H,W,3], alpha [H,W], depth [H,W])."""
        p = self.gstate.params
        scales, opac = p.activated()
        render, alpha, _ = rasterize(
            p.means,
            p.quats,
            scales,
            opac,
            p.sh_coeffs(),
            jnp.linalg.inv(jnp.asarray(camtoworld, jnp.float32))[None],
            jnp.asarray(K, jnp.float32)[None],
            width,
            height,
            sh_degree=self.cfg.sh_degree,
            alive=self.gstate.alive,
            masks=(
                jnp.asarray(masks)[None] if masks is not None else None
            ),
            backgrounds=(
                jnp.asarray([self.cfg.background_color], jnp.float32)
                if self.cfg.background_color is not None
                else None
            ),
            render_mode=render_mode,
            camera_model=self.cfg.camera_model,
            tile_size=self.cfg.tile_size,
            pair_capacity=self.cfg.pair_capacity,
            chunk_size=self.cfg.chunk_size,
            # "auto" resolves to the tile kernel even on CPU here: eval
            # renders run at full image size, where the dense XLA oracle's
            # O(capacity x pixels) buffers blow up (135 GB at a 131k cap
            # and 160x120), while the forward-only interpret kernel is
            # cheap. The train step keeps render.py's auto semantics.
            impl=(
                "pallas"
                if self.cfg.rasterizer_impl == "auto"
                and jax.default_backend() == "cpu"
                else self.cfg.rasterizer_impl
            ),
            rasterize_mode="antialiased" if self.cfg.antialiased else "classic",
        )
        color = np.clip(np.asarray(render[0, ..., :3]), 0, 1)
        depth = (
            np.asarray(render[0, ..., 3]) if render_mode == "RGB+ED" else None
        )
        return color, np.asarray(alpha[0, ..., 0]), depth

    def eval(self, step: int, stage: str = "val") -> Dict[str, float]:
        cfg = self.cfg
        psnrs, ssims, times, cc_psnrs, lpipss = [], [], [], [], []
        from ..ops.lpips import lpips_available

        use_lpips = lpips_available()
        os.makedirs(os.path.join(cfg.result_dir, "renders"), exist_ok=True)
        for i in range(len(self.valset)):
            item = self.valset[i]
            h, w = item["image"].shape[:2]
            t0 = time.time()
            color, alpha, _ = self.render(
                item["camtoworld"], item["K"], w, h, render_mode="RGB"
            )
            times.append(time.time() - t0)
            gt = item["image"]
            psnrs.append(float(psnr(jnp.asarray(color), jnp.asarray(gt))))
            ssims.append(
                float(ssim(jnp.asarray(color)[None], jnp.asarray(gt)[None]))
            )
            if cfg.use_bilateral_grid:
                cc = color_correct(jnp.asarray(color), jnp.asarray(gt))
                cc_psnrs.append(float(psnr(cc, jnp.asarray(gt))))
            if use_lpips:
                from ..ops.lpips import lpips

                lpipss.append(
                    float(lpips(jnp.asarray(color)[None], jnp.asarray(gt)[None]))
                )
            if i < 4 or cfg.save_predictions:
                import imageio.v2 as imageio

                canvas = np.concatenate([gt, color], axis=1)
                imageio.imwrite(
                    os.path.join(
                        cfg.result_dir, "renders", f"{stage}_{step}_{i:03d}.png"
                    ),
                    (canvas * 255).astype(np.uint8),
                )
        stats = dict(
            psnr=float(np.mean(psnrs)),
            ssim=float(np.mean(ssims)),
            ellipse_time=float(np.mean(times)) if times else 0.0,
            num_GS=int(num_alive(self.gstate)),
        )
        if cc_psnrs:
            stats["cc_psnr"] = float(np.mean(cc_psnrs))
        if lpipss:
            stats["lpips"] = float(np.mean(lpipss))
        with open(
            os.path.join(cfg.result_dir, "stats", f"{stage}_step{step}.json"),
            "w",
        ) as f:
            json.dump(stats, f, indent=2)
        w = self.writer
        for k, v in stats.items():
            w.add_scalar(f"{stage}/{k}", v, step)
        print(f"eval step {step}: PSNR={stats['psnr']:.3f} SSIM={stats['ssim']:.4f}")
        return stats

    def render_traj(self, step: int, n_frames: int = 60):
        """Render a camera-path video (RGB + normalized depth side panel)."""
        from ..datasets.traj import get_path

        cfg = self.cfg
        c2ws = np.stack(
            [self.parser.images[int(i)].camtoworld
             for i in self.parser.split_indices("train")]
        )
        path = get_path(cfg.render_traj_path, c2ws, n_frames=n_frames)
        K = self.trainset[0]["K"]
        import imageio.v2 as imageio

        video_path = os.path.join(
            cfg.result_dir, "renders", f"traj_{step}.mp4"
        )
        frames = []
        for c2w in path[:n_frames]:
            color, alpha, depth = self.render(
                c2w, K, self.width, self.height, render_mode="RGB+ED"
            )
            d = depth / max(float(depth.max()), 1e-6)
            canvas = np.concatenate(
                [color, np.repeat(d[..., None], 3, axis=-1)], axis=1
            )
            frames.append((canvas * 255).astype(np.uint8))
        try:
            imageio.mimwrite(video_path, frames, fps=30)
        except Exception:  # no ffmpeg: fall back to per-frame PNGs
            for j, fr in enumerate(frames):
                imageio.imwrite(video_path.replace(".mp4", f"_{j:04d}.png"), fr)
        return video_path

    # ---------------------------------------------------------------- ckpt

    def save(self, step: int) -> str:
        """Full-state checkpoint (params + optimizer + strategy + step) —
        unlike the reference (eval-only restart, trainer.py:22-34) this
        supports exact mid-training resume."""
        path = os.path.join(self.cfg.result_dir, "ckpts", f"ckpt_{step}.npz")
        flat = {
            "step": np.asarray(step),
            "alive": np.asarray(self.gstate.alive),
            "transform": self.parser.transform,
        }
        for name in self.gstate.params._fields:
            flat[f"params/{name}"] = np.asarray(getattr(self.gstate.params, name))
            flat[f"mu/{name}"] = np.asarray(getattr(self.adam.mu, name))
            flat[f"nu/{name}"] = np.asarray(getattr(self.adam.nu, name))
        flat["adam_count"] = np.asarray(self.adam.count)
        for name in self.sstate._fields:
            flat[f"strategy/{name}"] = np.asarray(getattr(self.sstate, name))
        # Aux parameter groups (pose/appearance/bilateral grid), flattened.
        leaves, _ = jax.tree_util.tree_flatten(self.aux)
        for i, leaf in enumerate(leaves):
            flat[f"aux/{i}"] = np.asarray(leaf)
        np.savez(path, **flat)
        return path

    def load(self, path: str) -> int:
        data = np.load(path)
        p = self.gstate.params
        params = type(p)(
            **{n: jnp.asarray(data[f"params/{n}"]) for n in p._fields}
        )
        mu = type(p)(**{n: jnp.asarray(data[f"mu/{n}"]) for n in p._fields})
        nu = type(p)(**{n: jnp.asarray(data[f"nu/{n}"]) for n in p._fields})
        self.gstate = GaussianState(
            params=params, alive=jnp.asarray(data["alive"])
        )
        self.adam = self.adam._replace(
            mu=mu, nu=nu, count=jnp.asarray(data["adam_count"])
        )
        self.sstate = type(self.sstate)(
            **{
                n: jnp.asarray(data[f"strategy/{n}"])
                for n in self.sstate._fields
            }
        )
        leaves, treedef = jax.tree_util.tree_flatten(self.aux)
        keys = [k for k in data.files if k.startswith("aux/")]
        if len(keys) == len(leaves) and leaves:
            new_leaves = [
                jnp.asarray(data[f"aux/{i}"]) for i in range(len(leaves))
            ]
            self.aux = jax.tree_util.tree_unflatten(treedef, new_leaves)
        self._place_state()
        self.global_step = int(data["step"])
        return self.global_step

    def run_compression(self, step: int) -> str:
        """Compressed splat export (reference run_compression,
        runner.py:863-878; ours is a Morton-ordered quantized npz codec)."""
        from ..utils.compression import compress_splats

        alive = np.asarray(self.gstate.alive)
        p = self.gstate.params
        path = os.path.join(
            self.cfg.result_dir, f"compressed_{step}.npz"
        )
        compress_splats(
            path,
            np.asarray(p.means)[alive],
            np.asarray(p.scales)[alive],
            np.asarray(p.quats)[alive],
            np.asarray(p.opacities)[alive],
            np.asarray(p.sh0)[alive],
            np.asarray(p.shN)[alive],
        )
        return path

    def export_ply(self, step: int) -> str:
        from ..utils.ply import write_ply_splats

        alive = np.asarray(self.gstate.alive)
        p = self.gstate.params
        path = os.path.join(self.cfg.result_dir, f"splats_{step}.ply")
        write_ply_splats(
            path,
            np.asarray(p.means)[alive],
            np.asarray(p.scales)[alive],
            np.asarray(p.quats)[alive],
            np.asarray(p.opacities)[alive],
            np.asarray(p.sh0)[alive],
            np.asarray(p.shN)[alive],
        )
        return path
