"""Configuration surface for the TPU-native 3DGS + monocular-depth-init framework.

Field names deliberately mirror the reference config surface
(/root/reference/gs_init_compare/config.py:20-221) so that the evaluator
sweep syntax and nerfbaselines ``--set`` overrides carry over, but the
dataclasses here are organized for a functional JAX engine: everything that
enters a jitted train step is a plain static hyperparameter; capacity-style
fields (``max_gaussians``, ``pair_capacity``) exist because XLA requires
static shapes and have no reference counterpart.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Literal, Optional, Tuple


# --------------------------------------------------------------------------
# Densification strategies (reference: gsplat DefaultStrategy / MCMCStrategy,
# see SURVEY.md §2.4). Ours operate on fixed-capacity buffers + alive masks.
# --------------------------------------------------------------------------


@dataclass(eq=False)
class DefaultStrategyConfig:
    """Grow/split/prune densification from screen-space gradient statistics."""

    name: Literal["default"] = "default"
    # Gradient threshold for duplication/split (mean2d grad, image-size scaled).
    grow_grad2d: float = 0.0002
    # Scale threshold separating duplicate (small) from split (large).
    grow_scale3d: float = 0.01
    grow_scale2d: float = 0.05
    prune_opa: float = 0.005
    prune_scale3d: float = 0.1
    prune_scale2d: float = 0.15
    refine_scale2d_stop_iter: int = 0
    refine_start_iter: int = 500
    refine_stop_iter: int = 15_000
    reset_every: int = 3000
    refine_every: int = 100
    pause_refine_after_reset: int = 0
    absgrad: bool = False
    revised_opacity: bool = False
    verbose: bool = False


@dataclass(eq=False)
class MCMCStrategyConfig:
    """MCMC relocation densification (stochastic gaussian langevin moves)."""

    name: Literal["mcmc"] = "mcmc"
    cap_max: int = 1_000_000
    noise_lr: float = 5e5
    refine_start_iter: int = 500
    refine_stop_iter: int = 25_000
    refine_every: int = 100
    min_opacity: float = 0.005
    verbose: bool = False


# --------------------------------------------------------------------------
# Depth alignment (reference: depth_alignment/config.py)
# --------------------------------------------------------------------------


@dataclass(eq=False)
class RansacConfig:
    inlier_threshold: float = 0.01
    max_iterations: int = 2500
    confidence: float = 0.999
    sample_size: int = 4
    # Reference RansacConfig.min_iters: a floor on the adaptive-termination
    # iteration count. Inert here — the vmapped estimator always evaluates
    # the FULL max_iterations budget (strictly more coverage), so every
    # min_iters value is trivially satisfied. Accepted for CLI parity.
    min_iterations: int = 0
    # TPU addition: hypotheses are evaluated as one vmapped batch instead of a
    # Python loop (reference loops in
    # depth_alignment/alignment/ransacs.py:100-189); this sets the batch.
    hypothesis_batch: int = 256


@dataclass(eq=False)
class InterpolatedAlignmentConfig:
    prealign: Literal["ransac", "msac", "lstsqrs"] = "ransac"
    # "delaunay" is the reference's "linear" (scipy LinearNDInterpolator);
    # the reference defaults to it (depth_alignment/config.py InterpConfig).
    method: Literal["rbf", "delaunay"] = "delaunay"
    rbf_grid_width: int = 256
    # Reference InterpConfig parity (depth_alignment/config.py):
    # LOF/kNN-median scale-outlier removal toggle (default True there too).
    scale_outlier_removal: bool = True
    # RBF smoothing (torchrbf smoothing param; ridge term on the TPS solve).
    smoothing: float = 0.001
    # Only thin_plate_spline is implemented (ops/rbf.py); other torchrbf
    # kernels raise rather than silently substituting.
    kernel: str = "thin_plate_spline"
    # Cap on points entering the dense TPS solve (-1 = all); the solve is
    # O(M^3) and the reference caps at 5000 for the same reason.
    max_rbf_points: int = 5000
    lof_neighbors: int = 20
    lof_threshold: float = 1.5
    knn_median_neighbors: int = 8
    knn_median_threshold: float = 2.0


@dataclass(eq=False)
class SegmentationConfig:
    method: Optional[Literal["slic", "sam"]] = None
    slic_n_segments: int = 40
    slic_compactness: float = 0.01
    # Region merging thresholds (reference region_merging.py / config.py:97-98).
    merge_gradient_threshold: float = 5e-4
    merge_min_sfm_points: int = 5
    # Reference default 10 (DepthSegmentationConfig.region_margin), scaled
    # by max(H, W)/1297 at use; inert while segmentation.method is None.
    region_margin: float = 10.0
    # Reference DepthSegmentationConfig.propagate_mask: the margin deadzone
    # always excludes SfM points from the per-region fit; with this set it
    # ALSO cuts the deadzone out of the output mask (default False).
    propagate_mask: bool = False
    # SAM segmenter (reference SAMSegmentationconfig defaults,
    # depth_alignment/config.py:55-76); weights-gated on a local checkpoint.
    sam_variant: Literal["vit_b", "vit_l", "vit_h"] = "vit_h"
    sam_img_size: int = 1024  # SAM's trained input resolution
    sam_allow_random_weights: bool = False  # synced from mdi.allow_random_weights
    sam_use_normals: bool = True
    sam_degenerate_mask_thresh: float = 0.9
    sam_expansion_radius: int = 4
    sam_tiny_region_area_fraction: float = 1e-4


@dataclass(eq=False)
class DepthAlignmentConfig:
    method: Literal["lstsqrs", "ransac", "msac", "interpolate"] = "ransac"
    ransac: RansacConfig = field(default_factory=RansacConfig)
    interp: InterpolatedAlignmentConfig = field(
        default_factory=InterpolatedAlignmentConfig
    )
    segmentation: SegmentationConfig = field(default_factory=SegmentationConfig)
    # Minimum fraction of an image's SfM points that must reproject validly;
    # below this the image is skipped (reference points_from_depth.py:124-129).
    min_valid_sfm_fraction: float = 0.25


# --------------------------------------------------------------------------
# Depth subsampling (reference: depth_subsampling/config.py)
# --------------------------------------------------------------------------


@dataclass(eq=False)
class AdaptiveSubsamplingConfig:
    min_stride: int = 5
    max_stride: int = 15


@dataclass(eq=False)
class SfmPointsMaskConfig:
    # The reference defaults this mask ON (use_num_sfm_points_mask=True,
    # config.py:47): patches already dense with SfM points contribute no
    # depth points, avoiding redundant gaussians in well-covered regions.
    enabled: bool = True
    patches_per_image_side: int = 20
    max_sfm_points_per_patch: int = 15


@dataclass(eq=False)
class DepthSubsamplingConfig:
    method: Literal["static", "adaptive"] = "static"
    # Static stride: keep every k-th row and column (reference config.py:44).
    factor: int = 10
    adaptive: AdaptiveSubsamplingConfig = field(
        default_factory=AdaptiveSubsamplingConfig
    )
    sfm_mask: SfmPointsMaskConfig = field(default_factory=SfmPointsMaskConfig)


# --------------------------------------------------------------------------
# Point-cloud postprocess (reference: point_cloud_postprocess/config.py)
# --------------------------------------------------------------------------


@dataclass(eq=False)
class PointCloudPostprocessConfig:
    lof_outlier_removal: bool = False
    lof_neighbors: int = 40
    merge_subsample: bool = False
    # KD-split merge parameters (reference subsampling_params.py:5-17).
    merge_max_aspect_ratio: float = 1.1
    merge_extent_multiplier: float = 1.0
    # Device-side alternative to the exact C++ KD-split merge: morton-sorted
    # voxel merge (TPU addition; C++ exact path also provided in native/).
    merge_impl: Literal["native", "voxel"] = "native"


# --------------------------------------------------------------------------
# Monocular depth init (reference: config.py:20-66, namespace ``mdi.*``)
# --------------------------------------------------------------------------


@dataclass(eq=False)
class MonocularDepthInitConfig:
    predictor: Literal[
        "stub",
        "depth_anything_v2",
        "metric3d",
        "moge",
        "unidepth",
        "depth_pro",
    ] = "metric3d"  # reference default (config.py:29)
    # Predictor backbone, e.g. vits/vitb/vitl for DA-V2, small/large for M3D
    # (vit names map to M3D sizes in pick_model). The reference defaults
    # every predictor's backbone to vitl (depth_prediction/configs.py).
    backbone: str = "vitl"
    # Metric vs relative depth output for DA-V2 (reference default True,
    # DepthAnythingV2Config.metric).
    metric: bool = True
    metric_variant: Literal["indoor", "outdoor"] = "indoor"
    alignment: DepthAlignmentConfig = field(default_factory=DepthAlignmentConfig)
    subsampling: DepthSubsamplingConfig = field(
        default_factory=DepthSubsamplingConfig
    )
    postprocess: PointCloudPostprocessConfig = field(
        default_factory=PointCloudPostprocessConfig
    )
    # Depth-gradient mask: drop pixels with steep depth gradient (edges).
    depth_gradient_mask: bool = False
    depth_gradient_threshold: float = 0.1
    # Union SfM points into the init cloud (reference mono..init.py:179-181;
    # the reference DEFAULTS this on, config.py:38 — the exact SfM points
    # anchor the well-reconstructed regions while the depth cloud fills the
    # rest).
    include_sfm_points: bool = True
    # Per-image gaussian noise fraction of scene scale (fault injection).
    noise_frac: float = 0.0
    # Export the merged init cloud as PLY and exit (reference pts_only).
    pts_only: bool = False
    export_ply: bool = False
    # Directory for exported init point clouds (reference pts_output_dir;
    # None = cfg.result_dir). Setting it implies the merged-cloud export.
    pts_output_dir: Optional[str] = None
    # Additionally write one PLY per source image (reference
    # pts_output_per_image).
    pts_output_per_image: bool = False
    # On-disk depth cache directory (resumable memo of the expensive stage).
    cache_dir: str = "__mono_depth_cache__"
    use_cache: bool = True
    # Clamp init scales to a kNN-distance quantile
    # (reference monocular_depth_init.py:215-224, limit_init_scale).
    scale_clamp_quantile: float = 0.0
    # Permit predictors to run with random (untrained) weights — for
    # pipeline/shape testing only; real runs must load converted weights.
    allow_random_weights: bool = False
    # TPU addition: images are depth-predicted in pjit-batched groups instead
    # of the reference's serial per-image loop (monocular_depth_init.py:120).
    # Measured on v5e at 1296x840 (scripts/bench_depth.py, uint8 wire
    # format): dav2-vits b1 3.52 imgs/s vs b8 2.40 — the single-chip relay
    # pipeline favors small batches (the big batched output fetch stalls
    # un-overlapped). Keep 1 on relayed single-chip; raise for pjit meshes.
    predict_batch_size: int = 1


# --------------------------------------------------------------------------
# Top-level config (reference: config.py:70-221)
# --------------------------------------------------------------------------


@dataclass(eq=False)
class Config:
    # Data
    data_dir: str = "data/360_v2/garden"
    data_factor: int = 4
    result_dir: str = "results/garden"
    test_every: int = 8
    patch_size: Optional[int] = None
    global_scale: float = 1.0
    normalize_world_space: bool = True
    camera_model: Literal["pinhole", "ortho", "fisheye"] = "pinhole"
    # Async input pipeline (reference parity: DataLoader(num_workers=4,
    # persistent_workers=True, pin_memory=True), runner.py:411-418). A
    # background thread decodes+undistorts+stacks+device_puts batches ahead
    # of the train loop; 0 disables prefetch (synchronous path).
    data_prefetch: int = 2
    # Decoded-image cache budget (uint8, post-undistort) PER Dataset
    # instance (train and val each get this much); 0 disables caching.
    image_cache_gb: float = 2.0

    # Init
    init_type: Literal["sfm", "random", "monocular_depth"] = "sfm"
    init_num_pts: int = 100_000
    init_extent: float = 3.0
    init_opa: float = 0.1
    init_scale: float = 1.0
    mdi: MonocularDepthInitConfig = field(default_factory=MonocularDepthInitConfig)

    # Training schedule
    max_steps: int = 30_000
    eval_steps: List[int] = field(default_factory=lambda: [7_000, 30_000])
    save_steps: List[int] = field(default_factory=lambda: [7_000, 30_000])
    save_ply: bool = False
    # Save ALL val predictions (gt|render canvases) at eval steps, enabling
    # the sweep's separate metric-recompute pass (reference
    # nerfbaselines_evaluator.py:691-700 evaluates from saved predictions).
    save_predictions: bool = False
    ply_steps: List[int] = field(default_factory=lambda: [7_000, 30_000])
    steps_scaler: float = 1.0

    batch_size: int = 1
    # Loss
    ssim_lambda: float = 0.2
    opacity_reg: float = 0.0
    scale_reg: float = 0.0
    depth_loss: bool = False
    depth_lambda: float = 1e-2
    random_bkgd: bool = False
    # Fixed composite background (reference Config.background_color; the
    # blender dataset preset sets white). Ignored when random_bkgd is on.
    background_color: Optional[Tuple[float, float, float]] = None

    # Model
    sh_degree: int = 3
    sh_degree_interval: int = 1000
    max_gaussians: int = 1_000_000  # static capacity buffer (TPU addition)
    near_plane: float = 0.01
    far_plane: float = 1e10
    antialiased: bool = False
    # gsplat memory-mode compat flags (reference runner.py:341-362). The TPU
    # rasterizer is *always* packed: binning compacts camera-gaussian pairs
    # into a static pair table ([PACK_COLS, pair_capacity], ops/tiles.py) and
    # no [C, N]-dense image-space intermediate ever exists — so `packed` is
    # accepted and inherent. Per-pair gradients likewise reduce through the
    # sorted record table (ops/rasterize.py::_render_bwd), the dense-free
    # analog of gsplat's sparse_grad; XLA's static shapes have no COO form,
    # so `sparse_grad` changes nothing here either.
    packed: bool = True
    sparse_grad: bool = False

    # Rasterizer capacities (TPU additions; XLA needs static shapes).
    # 32px tiles measured 1.7x faster than 16px at garden scale: ~2.4x fewer
    # tile-gaussian pairs and 1024-pixel MXU contractions per chunk.
    tile_size: int = 32
    pair_capacity: int = 4_194_304
    # Auto-tune pair_capacity from observed pair counts (recompiles the
    # step when the capacity is >2x too large or overflowing; checks happen
    # on refine boundaries so recompiles coincide with natural pauses).
    auto_pair_capacity: bool = True
    chunk_size: int = 128
    # Physically reorder the packed attribute table by center tile each step
    # so the per-pair pack gather reads near-contiguous rows (HBM access
    # locality) at the cost of one extra [C*N]-row gather + rank remap.
    reorder_table: bool = False
    # Pack the backward gradient-record sort's payload columns as bf16
    # pairs (half the sort traffic; ~0.2% per-pair gradient rounding noise).
    # Default ON: measured +5% steps/s at 300k and +6.6% at 3M gaussians on
    # TPU v5e with no visible quality impact (grads-close + train-smoke
    # tests); set False for exact-f32 gradient records.
    sort_bf16: bool = True
    # Ship the per-pair attribute table over the compressed 8-column int32
    # wire format (mx/my/gid exact f32 bits, the 8 remaining attributes as
    # bf16 pairs): halves the dominant pack-gather traffic and the kernels'
    # chunk DMA. Default ON: measured 16.05 -> 16.50 steps/s at 300k
    # gaussians on TPU v5e (round-5 A/B); forward-only rounding at the same
    # ~2^-9 noise floor as sort_bf16. Set False for the 16-column f32 wire.
    wire8: bool = True
    # Use the Pallas tile kernel ("pallas") or the pure-XLA reference
    # compositor ("xla", used on CPU/tests and tiny scenes).
    rasterizer_impl: Literal["auto", "pallas", "xla"] = "auto"

    # Device mesh for multi-chip training (TPU equivalent of the reference's
    # gsplat.distributed launcher, trainer.py:58). "auto": use every visible
    # device (data axis = gcd(batch_size, n_devices), remainder gaussian
    # shards); "off": single-device step regardless of device count;
    # "DxG" (e.g. "2x4"): explicit data x gauss mesh shape.
    mesh: str = "auto"
    # Shard horizontal pixel BANDS over the data axis instead of cameras
    # (batch replicated). The multi-chip configuration for batch_size=1 at
    # millions of gaussians: camera data-parallelism cannot split the
    # dominant binning+compositing cost there; band parallelism divides it
    # by the data axis (see parallel/shard.make_band_sharded_train_step).
    shard_pixels: bool = False

    # Learning rates (reference runner.py:128-137)
    means_lr: float = 1.6e-4
    scales_lr: float = 5e-3
    opacities_lr: float = 5e-2
    quats_lr: float = 1e-3
    sh0_lr: float = 2.5e-3
    shN_lr: float = 2.5e-3 / 20

    # Pose optimization
    pose_opt: bool = False
    pose_opt_lr: float = 1e-5
    pose_opt_reg: float = 1e-6
    pose_noise: float = 0.0

    # Appearance optimization
    app_opt: bool = False
    app_embed_dim: int = 16
    app_opt_lr: float = 1e-3
    app_opt_reg: float = 1e-6

    # Bilateral grid
    # Test-time per-image appearance-embedding fit (reference Config
    # app_test_opt_steps/app_test_opt_lr; integration optimize_embedding).
    app_test_opt_steps: int = 128
    app_test_opt_lr: float = 0.1
    use_bilateral_grid: bool = False
    bilateral_grid_shape: Tuple[int, int, int] = (16, 16, 8)
    tv_lambda: float = 10.0

    # Strategy
    strategy: object = field(default_factory=DefaultStrategyConfig)

    # Eval / render
    lpips_net: Literal["alex", "vgg"] = "alex"
    render_traj_path: Literal["interp", "ellipse_z", "ellipse_y", "spiral"] = (
        "interp"
    )
    compression: Optional[Literal["quantized", "png"]] = None

    # Logging / infra
    disable_viewer: bool = True
    # Reference parity (config.py:74 / trainer.py:38): with the viewer
    # enabled, the trainer blocks after training unless this is set. Our
    # viewer thread is non-blocking by design; this only controls the
    # post-train keep-alive.
    non_blocking_viewer: bool = False
    port: int = 8080
    tb_every: int = 100
    # Profiling: capture a jax.profiler trace covering steps
    # [profile_start, profile_start + profile_steps) into result_dir/profile.
    profile_start: int = -1
    profile_steps: int = 3
    tb_save_image: bool = False
    ckpt: Optional[List[str]] = None
    seed: int = 42
    # Multi-device: data-parallel camera batch over this many devices; 1 means
    # single-chip. Gaussians are additionally sharded when gaussian_shards>1.
    data_parallel: int = 1
    gaussian_shards: int = 1

    def adjust_steps(self, factor: Optional[float] = None) -> None:
        """Scale every step-schedule by ``steps_scaler``.

        Mirrors reference Config.adjust_steps (config.py:204-221) including
        strategy refine schedules.
        """
        f = self.steps_scaler if factor is None else factor
        if f == 1.0:
            return
        self.eval_steps = [int(s * f) for s in self.eval_steps]
        self.save_steps = [int(s * f) for s in self.save_steps]
        self.ply_steps = [int(s * f) for s in self.ply_steps]
        self.max_steps = int(self.max_steps * f)
        self.sh_degree_interval = int(self.sh_degree_interval * f)
        s = self.strategy
        if isinstance(s, DefaultStrategyConfig):
            s.refine_start_iter = int(s.refine_start_iter * f)
            s.refine_stop_iter = int(s.refine_stop_iter * f)
            s.reset_every = int(s.reset_every * f)
            s.refine_every = int(s.refine_every * f)
        elif isinstance(s, MCMCStrategyConfig):
            s.refine_start_iter = int(s.refine_start_iter * f)
            s.refine_stop_iter = int(s.refine_stop_iter * f)
            s.refine_every = int(s.refine_every * f)
        else:
            raise ValueError(f"unknown strategy {s!r}")


def to_dict(cfg) -> dict:
    """Recursively convert a config dataclass to a plain dict (for cfg.yml)."""
    if dataclasses.is_dataclass(cfg) and not isinstance(cfg, type):
        return {
            f.name: to_dict(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)
        }
    if isinstance(cfg, (list, tuple)):
        return [to_dict(v) for v in cfg]
    return cfg
