"""MoGe-2 predictor — Flax DINOv2 encoder + conv geometry head.

Equivalent of the reference predictor (depth_prediction/predictors/
moge.py:8-33: ``MoGeModel.from_pretrained("Ruicheng/moge-2-<bb>-normal")``,
returning depth + mask + normal). The MoGe submodule is NOT checked out in
the reference snapshot (.gitmodules:1-9, empty third_party/MoGe), so the
model here is a block-level re-implementation of the published MoGe-2
design (models/moge.py) with a converter validated against a random-weights
torch assembly (tests/test_moge_parity.py — the Metric3D/DepthPro oracle
pattern).

Preprocessing follows MoGe's token-budget policy: the image is resized so
the ViT token count lands inside the published [1200, 3600] operating
range (we target ~1800), snapped to multiples of the 14-px patch,
ImageNet-normalized. Output depth is bilinearly resized back to the input
resolution. Batched + jitted inference.
"""
from __future__ import annotations

import logging
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from ...models.moge import MoGeModel
from .interface import PredictedDepth

_LOGGER = logging.getLogger(__name__)

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)
TARGET_TOKENS = 1800  # inside MoGe's num_tokens_range [1200, 3600]


class MoGePredictor:
    name = "moge"

    def __init__(
        self,
        backbone: str = "vitl",
        checkpoint=None,
        allow_random_weights: bool = False,
    ):
        self.backbone = backbone
        self.name = f"moge_{backbone}"
        self.net = MoGeModel(backbone=backbone)
        ckpt = checkpoint or self._find_ckpt(backbone)
        dummy = jnp.zeros((1, 14 * 4, 14 * 4, 3))
        self.variables = self.net.init(jax.random.PRNGKey(0), dummy)
        if ckpt:
            from .moge_convert import load_moge_weights

            self.variables = load_moge_weights(ckpt, self.variables, backbone)
            _LOGGER.info("moge weights loaded from %s", ckpt)
        elif not allow_random_weights:
            raise FileNotFoundError(
                "No MoGe checkpoint found. Place a moge-2 torch state_dict "
                "(moge2_<backbone>*.pt/.pth) or converted .npz under "
                "$GS_TPU_CHECKPOINT_DIR or ~/.cache/gs_init_tpu, or pass "
                "allow_random_weights=True (mdi.allow_random_weights) for "
                "pipeline/shape testing only."
            )
        else:
            _LOGGER.warning(
                "MoGe running with RANDOM weights (explicitly allowed) — "
                "predictions are not meaningful"
            )

        @jax.jit
        def _fwd(variables, x):
            return self.net.apply(variables, x)

        self._fwd = _fwd

    @staticmethod
    def _find_ckpt(backbone):
        for d in [
            os.environ.get("GS_TPU_CHECKPOINT_DIR", ""),
            os.path.expanduser("~/.cache/gs_init_tpu"),
        ]:
            if d and os.path.isdir(d):
                for n in sorted(os.listdir(d)):
                    if "moge" in n.lower() and backbone in n:
                        return os.path.join(d, n)
        return None

    def _proc_hw(self, h: int, w: int):
        scale = math.sqrt(TARGET_TOKENS * 14 * 14 / (h * w))
        nh = max(1, round(h * scale / 14)) * 14
        nw = max(1, round(w * scale / 14)) * 14
        return nh, nw

    def predict_depth_batch(self, images: np.ndarray, intrinsics) -> list:
        b, h, w = images.shape[:3]
        nh, nw = self._proc_hw(h, w)
        x = jax.image.resize(
            jnp.asarray(images, jnp.float32), (b, nh, nw, 3), "bilinear"
        )
        x = (x - _MEAN) / _STD
        out = self._fwd(self.variables, x)
        depth = jax.image.resize(out["depth"], (b, h, w), "bilinear")
        mask = jax.image.resize(out["mask_logit"], (b, h, w), "bilinear") > 0
        normal = jax.image.resize(out["normal"], (b, h, w, 3), "bilinear")
        normal = normal / jnp.maximum(
            jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-8
        )
        preds = []
        for i in range(b):
            d = np.asarray(depth[i], np.float32)
            m = np.asarray(mask[i]) & np.isfinite(d) & (d > 0)
            preds.append(
                PredictedDepth(
                    depth=d,
                    mask=m,
                    depth_confidence=None,
                    normal=np.asarray(normal[i], np.float32),
                    normal_confidence=None,
                )
            )
        return preds

    def predict_depth(self, image, intrinsics) -> PredictedDepth:
        return self.predict_depth_batch(image[None], [intrinsics])[0]
