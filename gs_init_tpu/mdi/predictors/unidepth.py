"""UniDepth v2 predictor — camera-conditioned metric depth.

Equivalent of the reference predictor (depth_prediction/predictors/
unidepth.py:12-51: torch.hub UniDepth v2, ``model.infer(rgb, K)`` ->
depth + confidence). The model (models/unidepth.py) is a block-level
re-implementation of the published v2 design; the converter is validated
against a random-weights torch assembly (tests/test_unidepth_parity.py).
Weights-gated like the other ports; intrinsics are rescaled to the
inference resolution and condition the prediction (UniDepth's defining
property). Batched + jitted inference.
"""
from __future__ import annotations

import logging
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from ...models.unidepth import UniDepthModel
from .interface import PredictedDepth

_LOGGER = logging.getLogger(__name__)

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)
TARGET_TOKENS = 1800


class UniDepthPredictor:
    name = "unidepth"

    def __init__(
        self,
        backbone: str = "vitl",
        checkpoint=None,
        allow_random_weights: bool = False,
    ):
        self.backbone = backbone
        self.name = f"unidepth_{backbone}"
        self.net = UniDepthModel(backbone=backbone)
        ckpt = checkpoint or self._find_ckpt(backbone)
        dummy = jnp.zeros((1, 14 * 4, 14 * 4, 3))
        # Init with K=None so the camera head traces too (full param tree
        # for converter validation).
        self.variables = self.net.init(jax.random.PRNGKey(0), dummy, None)
        if ckpt:
            from .unidepth_convert import load_unidepth_weights

            self.variables = load_unidepth_weights(
                ckpt, self.variables, backbone
            )
            _LOGGER.info("unidepth weights loaded from %s", ckpt)
        elif not allow_random_weights:
            raise FileNotFoundError(
                "No UniDepth checkpoint found. Place a unidepth-v2 torch "
                "state_dict (unidepth_v2_<backbone>*.pt/.pth) or converted "
                ".npz under $GS_TPU_CHECKPOINT_DIR or ~/.cache/gs_init_tpu, "
                "or pass allow_random_weights=True "
                "(mdi.allow_random_weights) for pipeline testing only."
            )
        else:
            _LOGGER.warning(
                "UniDepth running with RANDOM weights (explicitly allowed) "
                "— predictions are not meaningful"
            )

        @jax.jit
        def _fwd(variables, x, K):
            return self.net.apply(variables, x, K)

        self._fwd = _fwd

    @staticmethod
    def _find_ckpt(backbone):
        for d in [
            os.environ.get("GS_TPU_CHECKPOINT_DIR", ""),
            os.path.expanduser("~/.cache/gs_init_tpu"),
        ]:
            if d and os.path.isdir(d):
                for n in sorted(os.listdir(d)):
                    if "unidepth" in n.lower() and backbone in n:
                        return os.path.join(d, n)
        return None

    def predict_depth_batch(self, images: np.ndarray, intrinsics) -> list:
        b, h, w = images.shape[:3]
        scale = math.sqrt(TARGET_TOKENS * 14 * 14 / (h * w))
        nh = max(1, round(h * scale / 14)) * 14
        nw = max(1, round(w * scale / 14)) * 14
        x = jax.image.resize(
            jnp.asarray(images, jnp.float32), (b, nh, nw, 3), "bilinear"
        )
        x = (x - _MEAN) / _STD
        Ks = []
        have_k = all(i is not None for i in intrinsics)
        if have_k:
            for i in range(b):
                it = intrinsics[i]
                Ks.append(
                    np.array(
                        [
                            [it.fx * nw / w, 0, it.cx * nw / w],
                            [0, it.fy * nh / h, it.cy * nh / h],
                            [0, 0, 1],
                        ],
                        np.float32,
                    )
                )
            K = jnp.asarray(np.stack(Ks))
        else:
            K = None
        out = self._fwd(self.variables, x, K)
        depth = jax.image.resize(out["depth"], (b, h, w), "bilinear")
        conf = jax.image.resize(out["confidence"], (b, h, w), "bilinear")
        preds = []
        for i in range(b):
            d = np.asarray(depth[i], np.float32)
            preds.append(
                PredictedDepth(
                    depth=d,
                    mask=np.isfinite(d) & (d > 0),
                    depth_confidence=np.asarray(conf[i], np.float32),
                )
            )
        return preds

    def predict_depth(self, image, intrinsics) -> PredictedDepth:
        return self.predict_depth_batch(image[None], [intrinsics])[0]
