"""SAM-based depth segmentation: automatic mask generation + overlap-aware
region assignment.

TPU equivalent of the reference's SAM segmenter
(depth_alignment/segmentation/sam.py:69-154): the predicted depth map is
viridis-colormapped to RGB (and optionally the normal map rendered to RGB),
run through the SAM automatic mask generator (32x32 point-prompt grid,
multimask output, IoU + stability filtering, box NMS), and the resulting
masks are painted into a region map largest-first with the reference's
overlap rule (>75% overlap with an existing region merges into it,
sam.py:36-66). Post-processing mirrors sam.py:110-148: label expansion,
connected-component split of unassigned pixels, and tiny-component
separation.

The SAM forward runs batched/jitted on the TPU (64 point prompts per
batch); mask filtering/NMS/painting are host-side numpy (init-time only).
Weights-gated like the other model ports: segmentation.method="sam"
requires a local ``sam_vit_*.pth`` / converted ``.npz`` checkpoint.
"""
from __future__ import annotations

import functools
import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_LOGGER = logging.getLogger(__name__)

MASK_THRESHOLD = 0.0
_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
_STD = np.array([58.395, 57.12, 57.375], np.float32)


def viridis_rgb(x: np.ndarray) -> np.ndarray:
    """Minimal viridis colormap (11 anchor points, linear interpolation) —
    stands in for matplotlib.cm.viridis (sam.py:91) without the matplotlib
    dependency; SAM only needs a perceptually-ordered false-color input."""
    anchors = np.array(
        [
            [0.267, 0.005, 0.329],
            [0.283, 0.141, 0.458],
            [0.254, 0.265, 0.530],
            [0.207, 0.372, 0.553],
            [0.164, 0.471, 0.558],
            [0.128, 0.567, 0.551],
            [0.135, 0.659, 0.518],
            [0.267, 0.749, 0.441],
            [0.478, 0.821, 0.318],
            [0.741, 0.873, 0.150],
            [0.993, 0.906, 0.144],
        ],
        np.float32,
    )
    x = np.clip(x, 0.0, 1.0) * (len(anchors) - 1)
    lo = np.clip(x.astype(int), 0, len(anchors) - 2)
    f = (x - lo)[..., None]
    return anchors[lo] * (1 - f) + anchors[lo + 1] * f


class SamMaskGenerator:
    """Automatic mask generator around the Flax SAM (models/sam.py)."""

    def __init__(
        self,
        variant: str = "vit_h",
        checkpoint: Optional[str] = None,
        points_per_side: int = 32,
        points_per_batch: int = 64,
        pred_iou_thresh: float = 0.88,
        stability_score_thresh: float = 0.95,
        stability_offset: float = 1.0,
        box_nms_thresh: float = 0.7,
        img_size: int = 1024,
        allow_random_weights: bool = False,
    ):
        from .predictors.sam_convert import SAM_VARIANTS

        from ..models.sam import (
            SamImageEncoder,
            SamMaskDecoder,
            SamPromptEncoder,
        )

        self.img_size = img_size
        self.points_per_side = points_per_side
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_offset = stability_offset
        self.box_nms_thresh = box_nms_thresh

        cfg = SAM_VARIANTS[variant]
        emb = img_size // 16
        self.encoder = SamImageEncoder(
            img_size=img_size, dim=cfg["dim"], depth=cfg["depth"],
            num_heads=cfg["num_heads"],
            global_attn_indexes=cfg["global_attn_indexes"],
        )
        self.prompt = SamPromptEncoder(
            image_embedding_size=(emb, emb),
            input_image_size=(img_size, img_size),
        )
        self.decoder = SamMaskDecoder()

        ckpt = checkpoint or self._find_ckpt(variant)
        key = jax.random.PRNGKey(0)
        if ckpt:
            from .predictors.sam_convert import convert_sam_checkpoint
            from .predictors.depth_anything_v2 import load_checkpoint_file

            sd = load_checkpoint_file(ckpt)
            full = convert_sam_checkpoint(sd, variant)["params"]
            self.enc_vars = {"params": full["encoder"]}
            self.prompt_vars = {"params": full["prompt"]}
            self.dec_vars = {"params": full["decoder"]}
            _LOGGER.info("SAM weights loaded from %s", ckpt)
        elif allow_random_weights:
            k1, k2, k3 = jax.random.split(key, 3)
            dummy = jnp.zeros((1, self.img_size, self.img_size, 3))
            self.enc_vars = self.encoder.init(k1, dummy)
            self.prompt_vars = self.prompt.init(
                k2, jnp.zeros((1, 1, 2)), jnp.zeros((1, 1), jnp.int32)
            )
            self.dec_vars = self.decoder.init(
                k3,
                jnp.zeros((1, 4, 4, 256)),
                jnp.zeros((4, 4, 256)),
                jnp.zeros((1, 2, 256)),
                jnp.zeros((256,)),
            )
            _LOGGER.warning(
                "SAM running with RANDOM weights (explicitly allowed) — "
                "masks are not meaningful"
            )
        else:
            raise FileNotFoundError(
                "No SAM checkpoint found. Place sam_vit_h_4b8939.pth (or a "
                "converted .npz) under $GS_TPU_CHECKPOINT_DIR or "
                "~/.cache/gs_init_tpu, or set mdi.allow_random_weights for "
                "pipeline testing."
            )

        @jax.jit
        def _embed(enc_vars, x):
            return self.encoder.apply(enc_vars, x)

        @jax.jit
        def _decode(prompt_vars, dec_vars, embed, points, labels):
            sparse, no_mask = self.prompt.apply(
                prompt_vars, points, labels
            )
            dense_pe = self.prompt.apply(
                prompt_vars, method=self.prompt.dense_pe
            )
            masks, iou = self.decoder.apply(
                dec_vars,
                jnp.broadcast_to(embed, (points.shape[0],) + embed.shape[1:]),
                dense_pe,
                sparse,
                no_mask,
            )
            return masks, iou

        self._embed = _embed
        self._decode = _decode

    @staticmethod
    def _find_ckpt(variant):
        for d in [
            os.environ.get("GS_TPU_CHECKPOINT_DIR", ""),
            os.path.expanduser("~/.cache/gs_init_tpu"),
        ]:
            if d and os.path.isdir(d):
                for n in sorted(os.listdir(d)):
                    if "sam" in n.lower() and (
                        variant.replace("_", "") in n.replace("_", "")
                    ):
                        return os.path.join(d, n)
        return None

    def generate(self, image_rgb: np.ndarray) -> list:
        """image_rgb: [H, W, 3] uint8/float. Returns list of dicts with
        'segmentation' [H, W] bool, 'area', 'predicted_iou',
        'stability_score' — the SamAutomaticMaskGenerator output surface the
        reference consumes (sam.py:36-66)."""
        h, w = image_rgb.shape[:2]
        scale = self.img_size / max(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        x = jax.image.resize(
            jnp.asarray(image_rgb, jnp.float32), (nh, nw, 3), "bilinear"
        )
        x = (x - _MEAN) / _STD
        x = jnp.pad(x, ((0, self.img_size - nh), (0, self.img_size - nw), (0, 0)))
        embed = self._embed(self.enc_vars, x[None])

        # 32x32 point grid over the VALID (unpadded) region.
        pps = self.points_per_side
        gx = (np.arange(pps) + 0.5) / pps * nw
        gy = (np.arange(pps) + 0.5) / pps * nh
        pts = np.stack(np.meshgrid(gx, gy, indexing="xy"), -1).reshape(-1, 2)

        out_masks, out_iou, out_stab = [], [], []
        emb_side = self.img_size // 16
        for i in range(0, len(pts), self.points_per_batch):
            batch = pts[i : i + self.points_per_batch]
            pad = self.points_per_batch - len(batch)
            pb = np.pad(batch, ((0, pad), (0, 0)))
            points = jnp.asarray(pb, jnp.float32)[:, None, :]
            # Official SAM appends a padding not-a-point (label -1) to
            # every point prompt when no box is given
            # (segment_anything PromptEncoder._embed_points pad=True);
            # omitting it shifts the decoder token sequence and its mask
            # outputs systematically deviate from the reference AMG.
            points = jnp.concatenate(
                [points, jnp.zeros_like(points)], axis=1
            )
            labels = jnp.concatenate(
                [
                    jnp.ones((len(pb), 1), jnp.int32),
                    jnp.full((len(pb), 1), -1, jnp.int32),
                ],
                axis=1,
            )
            masks, iou = self._decode(
                self.prompt_vars, self.dec_vars, embed, points, labels
            )
            # Multimask output: drop the single-mask token 0 (AMG default
            # multimask_output=True uses tokens 1..3).
            masks = np.asarray(masks[: len(batch), 1:], np.float32)
            iou = np.asarray(iou[: len(batch), 1:], np.float32)
            t, o = MASK_THRESHOLD, self.stability_offset
            hi = (masks > t + o).sum(axis=(-2, -1)).astype(np.float32)
            lo = (masks > t - o).sum(axis=(-2, -1)).astype(np.float32)
            stab = hi / np.maximum(lo, 1.0)
            out_masks.append(masks)
            out_iou.append(iou)
            out_stab.append(stab)

        masks = np.concatenate(out_masks).reshape(
            -1, emb_side * 4, emb_side * 4
        )
        iou = np.concatenate(out_iou).reshape(-1)
        stab = np.concatenate(out_stab).reshape(-1)

        keep = (iou > self.pred_iou_thresh) & (
            stab > self.stability_score_thresh
        )
        masks, iou, stab = masks[keep], iou[keep], stab[keep]

        results = []
        lh = int(round(nh / 4))  # low-res extent of the valid region
        lw = int(round(nw / 4))
        boxes = []
        for m in masks:
            mb = m[:lh, :lw] > MASK_THRESHOLD
            ys, xs = np.nonzero(mb)
            if len(xs) == 0:
                boxes.append(None)
                continue
            boxes.append((xs.min(), ys.min(), xs.max(), ys.max()))
        order = np.argsort(-iou)
        kept = []
        for ix in order:
            if boxes[ix] is None:
                continue
            bx = boxes[ix]
            ok = True
            for jx in kept:
                bo = boxes[jx]
                ix0 = max(bx[0], bo[0])
                iy0 = max(bx[1], bo[1])
                ix1 = min(bx[2], bo[2])
                iy1 = min(bx[3], bo[3])
                inter = max(0, ix1 - ix0 + 1) * max(0, iy1 - iy0 + 1)
                a = (bx[2] - bx[0] + 1) * (bx[3] - bx[1] + 1)
                b = (bo[2] - bo[0] + 1) * (bo[3] - bo[1] + 1)
                if inter / (a + b - inter) > self.box_nms_thresh:
                    ok = False
                    break
            if ok:
                kept.append(ix)
        for ix in kept:
            full = np.asarray(
                jax.image.resize(
                    jnp.asarray(masks[ix][:lh, :lw]), (h, w), "bilinear"
                )
            ) > MASK_THRESHOLD
            area = int(full.sum())
            if area == 0:
                continue
            results.append(
                dict(
                    segmentation=full,
                    area=area,
                    predicted_iou=float(iou[ix]),
                    stability_score=float(stab[ix]),
                )
            )
        return results


UNASSIGNED = 0


def create_segmentation(
    masks: list, image_shape, degenerate_mask_thresh: float = 0.9
) -> np.ndarray:
    """Largest-first mask painting with the reference's >75% overlap merge
    rule (sam.py:36-66)."""
    order = np.argsort([-m["area"] for m in masks])
    seg = np.zeros(image_shape, dtype=np.int64)
    image_area = image_shape[0] * image_shape[1]
    cur = 1
    for ix in order:
        region = masks[ix]["segmentation"]
        if masks[ix]["area"] / image_area > degenerate_mask_thresh:
            continue
        values, counts = np.unique(seg[region], return_counts=True)
        largest = int(values[counts.argmax()])
        overlap = counts.max() / max(region.sum(), 1)
        if overlap > 0.75 and largest != UNASSIGNED:
            seg[region] = largest
        else:
            seg[region] = cur
            cur += 1
    return seg


def postprocess_segmentation(
    seg: np.ndarray,
    expansion_radius: int = 4,
    tiny_region_area_fraction: float = 1e-4,
) -> np.ndarray:
    """Label expansion + connected-component splitting (sam.py:110-148)."""
    from scipy import ndimage

    if expansion_radius > 0:
        # skimage.expand_labels equivalent: nearest labeled pixel within the
        # radius, via EDT feature transform over the unassigned area.
        dist, (iy, ix) = ndimage.distance_transform_edt(
            seg == UNASSIGNED, return_indices=True
        )
        grow = (seg == UNASSIGNED) & (dist <= expansion_radius)
        seg = seg.copy()
        seg[grow] = seg[iy[grow], ix[grow]]

    lab, n = ndimage.label(seg == UNASSIGNED)
    nxt = seg.max() + 1
    for f in range(1, n + 1):
        seg[lab == f] = nxt
        nxt += 1

    tiny = seg.shape[0] * seg.shape[1] * tiny_region_area_fraction
    out = np.zeros_like(seg)
    for label in np.unique(seg):
        if label == 0:
            continue
        lab, n = ndimage.label(seg == label)
        base = out.max() + 1
        extra = base + 1
        for f in range(1, n + 1):
            m = lab == f
            if m.sum() >= tiny:
                out[m] = base
            else:
                out[m] = extra
                extra += 1
    return out


@functools.lru_cache(maxsize=1)
def _cached_generator(variant, allow_random, img_size):
    return SamMaskGenerator(
        variant=variant, allow_random_weights=allow_random, img_size=img_size
    )


def segment_depth_sam(
    pred_depth: np.ndarray,
    pred_mask: np.ndarray,
    normals: Optional[np.ndarray],
    seg_cfg,
    allow_random_weights: bool = False,
) -> np.ndarray:
    """Full reference flow (sam.py:69-154): quantile-clamped normalized
    depth -> viridis RGB -> AMG (+ optional normal-image AMG) -> overlap
    assignment -> expansion/CC postprocess. Returns int labels [H, W]."""
    depth = np.asarray(pred_depth, np.float32).copy()
    # NaN/invalid-safe normalization: predictors legitimately emit
    # non-finite depth at masked pixels (e.g. MoGe sky), which would turn
    # np.quantile into NaN and the viridis image into garbage. Compute the
    # quantile window over valid finite pixels only and pin invalid pixels
    # to the window floor so they form their own uniform background region.
    ok = np.isfinite(depth) & np.asarray(pred_mask, bool)
    if not ok.any():
        return np.zeros(depth.shape, np.int32)
    lo, hi = np.quantile(depth[ok], [0.05, 0.95])
    depth = np.where(ok, np.clip(depth, lo, hi), lo)
    rng = depth.max() - depth.min()
    depth_norm = (depth - depth.min()) / (rng + 1e-8)

    gen = _cached_generator(
        seg_cfg.sam_variant, allow_random_weights, seg_cfg.sam_img_size
    )
    rgb = (255.0 * viridis_rgb(depth_norm)).astype(np.uint8)
    masks = gen.generate(rgb)
    if seg_cfg.sam_use_normals and normals is not None:
        nrgb = np.round(127.5 * (np.asarray(normals) + 1.0)).astype(np.uint8)
        masks = gen.generate(nrgb) + masks
    seg = create_segmentation(
        masks, depth.shape, seg_cfg.sam_degenerate_mask_thresh
    )
    return postprocess_segmentation(
        seg,
        expansion_radius=seg_cfg.sam_expansion_radius,
        tiny_region_area_fraction=seg_cfg.sam_tiny_region_area_fraction,
    )
