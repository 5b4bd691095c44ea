"""Monocular depth initialization orchestrator.

Equivalent of the reference's pts_and_rgb_from_monocular_depth
(monocular_depth_init.py:95-224) with TPU-native restructuring:
- depth prediction runs in batches (predict_batch_size) instead of a serial
  per-image loop
- per-image alignment/subsampling/unprojection is one jitted kernel
  (points_from_depth) with static shapes (SfM correspondences padded)
- the on-disk depth cache keeps the same role (a resumable memo of the most
  expensive stage), stored as npz per image
- images whose SfM points reproject with < min_valid_sfm_fraction validity
  are skipped (the reference's LowDepthAlignmentConfidenceError path)
"""
from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .alignment.pipeline import align_depth
from .points_from_depth import (
    masks_and_unproject,
    points_from_depth,
    project_sfm_points,
)
from .postprocess import postprocess_point_cloud
from .predictors.interface import CameraIntrinsics, pick_model

_LOGGER = logging.getLogger(__name__)


class LowDepthAlignmentConfidenceError(RuntimeError):
    pass


def _cache_path(cfg, image_name: str) -> str:
    dataset = os.path.basename(os.path.normpath(cfg.data_dir)) or "dataset"
    d = os.path.join(cfg.mdi.cache_dir, cfg.mdi.predictor, dataset)
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, image_name.replace("/", "_") + ".npz")


def _predict_or_cached(cfg, model, items):
    """Predict depth for a list of dataset items, using the on-disk cache."""
    preds = [None] * len(items)
    to_run = []
    for i, it in enumerate(items):
        p = _cache_path(cfg, it["image_name"])
        if cfg.mdi.use_cache and os.path.exists(p):
            try:
                data = np.load(p)
                nrm = data["normal"] if "normal" in data.files else None
                preds[i] = (data["depth"], data["mask"], nrm)
                continue
            except Exception:  # corrupted cache entry: recompute
                _LOGGER.warning("corrupted depth cache entry %s; recomputing", p)
                os.unlink(p)
        to_run.append(i)
    if to_run:
        images = np.stack([items[i]["image"] for i in to_run])
        intr = [
            CameraIntrinsics(
                fx=float(items[i]["K"][0, 0]),
                fy=float(items[i]["K"][1, 1]),
                cx=float(items[i]["K"][0, 2]),
                cy=float(items[i]["K"][1, 2]),
            )
            for i in to_run
        ]
        outs = model.predict_depth_batch(images, intr)
        for i, out in zip(to_run, outs):
            nrm = (
                np.asarray(out.normal) if out.normal is not None else None
            )
            preds[i] = (np.asarray(out.depth), np.asarray(out.mask), nrm)
            if cfg.mdi.use_cache:
                p = _cache_path(cfg, items[i]["image_name"])
                tmp = p + ".tmp"
                try:
                    # (np.savez appends ".npz" to bare paths — use a handle.)
                    extra = {} if nrm is None else {"normal": nrm}
                    with open(tmp, "wb") as f:
                        np.savez(
                            f, depth=preds[i][0], mask=preds[i][1], **extra
                        )
                    os.replace(tmp, p)
                except BaseException:  # interrupted write: drop partial file
                    if os.path.exists(tmp):
                        os.unlink(tmp)
                    raise
    return preds


def pts_and_rgb_from_monocular_depth(
    cfg, parser, model=None, rng: Optional[np.random.Generator] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Build the initialization point cloud from per-image depth predictions.

    Returns (points [N, 3] float32 world space, rgbs [N, 3] float32)."""
    from ..datasets.parser import Dataset

    model = model or pick_model(cfg)
    rng = rng or np.random.default_rng(cfg.seed)
    trainset = Dataset(parser, "train")
    mdi = cfg.mdi
    if mdi.allow_random_weights:
        mdi.alignment.segmentation.sam_allow_random_weights = True

    # Static SfM padding size across images.
    m_pad = max(
        int(max((len(v) for v in parser.point_indices.values()), default=1)), 1
    )

    all_pts, all_rgbs = [], []
    viewmats, Ks, widths, heights = [], [], [], []
    key = jax.random.PRNGKey(cfg.seed)
    bs = max(mdi.predict_batch_size, 1)
    n_skipped = 0
    for start in range(0, len(trainset), bs):
        items = [trainset[i] for i in range(start, min(start + bs, len(trainset)))]
        preds = _predict_or_cached(cfg, model, items)
        for it, (depth, mask, normal) in zip(items, preds):
            h, w = it["image"].shape[:2]
            idx = parser.point_indices.get(it["image_name"], np.empty(0, np.int64))
            sfm = np.zeros((m_pad, 3), np.float32)
            valid = np.zeros((m_pad,), bool)
            k = min(len(idx), m_pad)
            sfm[:k] = parser.points[idx[:k]]
            valid[:k] = True

            key, sk = jax.random.split(key)
            subsample_kw = dict(
                subsample_method=mdi.subsampling.method,
                subsample_factor=mdi.subsampling.factor,
                min_stride=mdi.subsampling.adaptive.min_stride,
                max_stride=mdi.subsampling.adaptive.max_stride,
                use_grad_mask=mdi.depth_gradient_mask,
                grad_threshold=mdi.depth_gradient_threshold,
                use_sfm_density_mask=mdi.subsampling.sfm_mask.enabled,
            )
            use_pipeline = (
                mdi.alignment.segmentation.method is not None
                or mdi.alignment.method == "interpolate"
            )
            if use_pipeline:
                # Host-orchestrated path: segmentation / interpolated scale
                # map, then the jitted mask+unprojection tail.
                viewmat = jnp.linalg.inv(jnp.asarray(it["camtoworld"], jnp.float32))
                pix, gt_z, ok = project_sfm_points(
                    jnp.asarray(sfm), jnp.asarray(valid), viewmat,
                    jnp.asarray(it["K"], jnp.float32), w, h,
                )
                frac = float(jnp.sum(ok)) / max(int(valid.sum()), 1)
                if frac < mdi.alignment.min_valid_sfm_fraction:
                    n_skipped += 1
                    _LOGGER.warning(
                        "skipping %s: only %.0f%% of SfM points valid",
                        it["image_name"], 100 * frac,
                    )
                    continue
                aligned, amask = align_depth(
                    np.asarray(depth, np.float32), np.asarray(mask),
                    np.asarray(pix), np.asarray(gt_z), np.asarray(ok),
                    sk, mdi.alignment, normals=normal,
                )
                world, m = masks_and_unproject(
                    jnp.asarray(aligned), jnp.asarray(amask),
                    jnp.asarray(it["camtoworld"], jnp.float32),
                    jnp.asarray(it["K"], jnp.float32),
                    pix, ok, width=w, height=h, **subsample_kw,
                )
                m = np.asarray(m)
                pts = np.asarray(world)[m]
            else:
                out = points_from_depth(
                    jnp.asarray(depth, jnp.float32),
                    jnp.asarray(mask),
                    jnp.asarray(it["camtoworld"], jnp.float32),
                    jnp.asarray(it["K"], jnp.float32),
                    jnp.asarray(sfm),
                    jnp.asarray(valid),
                    sk,
                    width=w,
                    height=h,
                    align_method=mdi.alignment.method,
                    ransac_iters=mdi.alignment.ransac.max_iterations,
                    ransac_threshold=mdi.alignment.ransac.inlier_threshold,
                    sample_size=mdi.alignment.ransac.sample_size,
                    **subsample_kw,
                )
                if (
                    float(out.valid_sfm_fraction)
                    < mdi.alignment.min_valid_sfm_fraction
                ):
                    n_skipped += 1
                    _LOGGER.warning(
                        "skipping %s: only %.0f%% of SfM points valid",
                        it["image_name"],
                        100 * float(out.valid_sfm_fraction),
                    )
                    continue
                m = np.asarray(out.mask)
                pts = np.asarray(out.pts_world)[m]
            rgb = it["image"].reshape(-1, 3)[m]
            if mdi.noise_frac > 0:
                pts = pts + rng.normal(
                    0, parser.scene_scale * mdi.noise_frac, pts.shape
                ).astype(np.float32)
            all_pts.append(pts)
            all_rgbs.append(rgb)
            if mdi.pts_output_per_image:
                from ..utils.ply import write_ply_points

                d = mdi.pts_output_dir or cfg.result_dir
                os.makedirs(d, exist_ok=True)
                # Flatten nested image names (e.g. "rig1/cam0.png") the
                # same way the depth cache does (_cache_path).
                stem = os.path.splitext(it["image_name"])[0].replace("/", "_")
                write_ply_points(
                    os.path.join(d, f"mdi_{stem}.ply"), pts, rgb
                )

    if not all_pts:
        raise LowDepthAlignmentConfidenceError(
            "every training image was skipped during depth alignment"
        )
    pts = np.concatenate(all_pts).astype(np.float32)
    rgbs = np.concatenate(all_rgbs).astype(np.float32)
    _LOGGER.info(
        "monocular depth init: %d points from %d images (%d skipped)",
        len(pts),
        len(trainset) - n_skipped,
        n_skipped,
    )

    if mdi.include_sfm_points:
        pts = np.concatenate([pts, parser.points.astype(np.float32)])
        rgbs = np.concatenate([rgbs, parser.points_rgb.astype(np.float32)])

    vms = np.stack(
        [np.linalg.inv(parser.images[int(i)].camtoworld)
         for i in parser.split_indices("train")]
    )
    Kmats = np.stack(
        [parser.images[int(i)].K for i in parser.split_indices("train")]
    )
    ws = [parser.images[int(i)].width for i in parser.split_indices("train")]
    hs = [parser.images[int(i)].height for i in parser.split_indices("train")]
    pts, rgbs = postprocess_point_cloud(cfg, pts, rgbs, vms, Kmats, ws, hs)

    if mdi.export_ply or mdi.pts_only or mdi.pts_output_dir:
        from ..utils.ply import write_ply_points

        out_dir = mdi.pts_output_dir or cfg.result_dir
        os.makedirs(out_dir, exist_ok=True)
        out = os.path.join(out_dir, "mdi_init_points.ply")
        write_ply_points(out, pts, rgbs)
        _LOGGER.info("exported init point cloud to %s", out)
        if mdi.pts_only:
            raise SystemExit(0)
    return pts, rgbs
