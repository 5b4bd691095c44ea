"""Depth predictor interface.

Mirrors the reference's PredictedDepth / DepthPredictor surface
(depth_prediction/predictors/depth_predictor_interface.py:8-71) with one
TPU-native change: prediction is *batched* (pjit data-parallel over images)
instead of the reference's serial per-image loop
(monocular_depth_init.py:120-177).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Protocol

import numpy as np


class CameraIntrinsics(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float


class PredictedDepth(NamedTuple):
    depth: np.ndarray  # [H, W] metric or relative depth
    mask: np.ndarray  # [H, W] bool validity
    depth_confidence: Optional[np.ndarray] = None  # [H, W]
    normal: Optional[np.ndarray] = None  # [H, W, 3]
    normal_confidence: Optional[np.ndarray] = None


class DepthPredictor(Protocol):
    name: str

    def predict_depth(
        self, image: np.ndarray, intrinsics: CameraIntrinsics
    ) -> PredictedDepth:
        """image: [H, W, 3] float in [0, 1]."""
        ...

    def predict_depth_batch(
        self, images: np.ndarray, intrinsics: list
    ) -> list:
        """Default: loop; TPU predictors override with batched inference."""
        return [
            self.predict_depth(images[i], intrinsics[i])
            for i in range(len(images))
        ]


def pick_model(cfg) -> DepthPredictor:
    """Factory mirroring the reference's lazy pick_model
    (monocular_depth_init.py:32-57)."""
    name = cfg.mdi.predictor
    if name == "stub":
        from .stub import StubPredictor

        return StubPredictor()
    if name == "depth_anything_v2":
        from .depth_anything_v2 import DepthAnythingV2Predictor

        return DepthAnythingV2Predictor(
            backbone=cfg.mdi.backbone,
            metric=cfg.mdi.metric,
            variant=cfg.mdi.metric_variant,
        )
    if name == "metric3d":
        from .metric3d import Metric3DPredictor

        backbone = cfg.mdi.backbone
        if backbone.startswith("vit"):
            backbone = {"vits": "small", "vitl": "large", "vitg": "giant"}.get(
                backbone, "small"
            )
        return Metric3DPredictor(
            backbone=backbone,
            allow_random_weights=cfg.mdi.allow_random_weights,
        )
    if name == "depth_pro":
        from .apple_depth_pro import AppleDepthProPredictor

        return AppleDepthProPredictor(
            allow_random_weights=cfg.mdi.allow_random_weights,
        )
    if name == "moge":
        from .moge import MoGePredictor

        backbone = cfg.mdi.backbone
        if backbone not in ("vits", "vitb", "vitl", "vitg"):
            backbone = "vitl"  # reference default moge-2-vitl-normal
        return MoGePredictor(
            backbone=backbone,
            allow_random_weights=cfg.mdi.allow_random_weights,
        )
    if name == "unidepth":
        from .unidepth import UniDepthPredictor

        backbone = cfg.mdi.backbone
        if backbone not in ("vits", "vitb", "vitl", "vitg"):
            backbone = "vitl"
        return UniDepthPredictor(
            backbone=backbone,
            allow_random_weights=cfg.mdi.allow_random_weights,
        )
    raise NotImplementedError(f"unknown predictor {name!r}")
