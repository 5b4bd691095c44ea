"""LPIPS perceptual metric — Flax AlexNet/VGG feature distance.

Replacement for the reference's torchmetrics LPIPS (runner.py:287-300,
lpips_net alex/vgg with normalize=True). The backbone features and linear
calibration weights must come from local torch checkpoints (zero-egress
environment): set GS_TPU_CHECKPOINT_DIR with

  - lpips_alex.pth  (torchvision alexnet features + LPIPS lin weights), or
  - a torchvision alexnet state_dict (alexnet-*.pth) — then uncalibrated
    (unit) lin weights are used, which still ranks image quality correctly
    even if absolute values differ from the official LPIPS calibration.

``lpips_available()`` gates usage; the Runner reports LPIPS only when
weights exist (mirroring how the reference gates compression extras,
trainer.py:47-56).
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

# AlexNet feature extractor config: (out_ch, kernel, stride, pad, pool_before)
_ALEX_LAYERS = [
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _find_weights() -> Optional[str]:
    for d in [
        os.environ.get("GS_TPU_CHECKPOINT_DIR", ""),
        os.path.expanduser("~/.cache/gs_init_tpu"),
        "checkpoints",
    ]:
        if not d or not os.path.isdir(d):
            continue
        for name in sorted(os.listdir(d)):
            if name.startswith(("lpips_alex", "alexnet")) and name.endswith(
                (".npz", ".pth", ".pt")
            ):
                return os.path.join(d, name)
    return None


def lpips_available() -> bool:
    return _find_weights() is not None


@functools.lru_cache
def _load_params():
    path = _find_weights()
    if path is None:
        raise FileNotFoundError(
            "no AlexNet/LPIPS weights found (set GS_TPU_CHECKPOINT_DIR)"
        )
    if path.endswith(".npz"):
        # Converted format (scripts/convert_lpips.py): conv{i}_w [k,k,in,out]
        # HWIO, conv{i}_b [out], optional lin{i} [ch] calibration.
        data = np.load(path)
        convs = [
            (jnp.asarray(data[f"conv{i}_w"]), jnp.asarray(data[f"conv{i}_b"]))
            for i in range(5)
        ]
        if all(f"lin{i}" in data.files for i in range(5)):
            lins = [jnp.asarray(data[f"lin{i}"]) for i in range(5)]
        else:
            lins = None
            _LOGGER.warning(
                "LPIPS npz has no linear calibration; using unit weights"
            )
        return convs, lins
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    # Accept either torchvision alexnet ("features.0.weight", ...) or an
    # LPIPS bundle ("net.slice..."/"lin0.model.1.weight").
    convs, lins = [], []
    tv_idx = [0, 3, 6, 8, 10]
    if "features.0.weight" in sd:
        for i in tv_idx:
            w = sd[f"features.{i}.weight"].numpy().transpose(2, 3, 1, 0)
            b = sd[f"features.{i}.bias"].numpy()
            convs.append((jnp.asarray(w), jnp.asarray(b)))
        lins = None
    else:
        slice_map = {0: "slice1", 1: "slice2", 2: "slice3", 3: "slice4", 4: "slice5"}
        for i, layer in enumerate(tv_idx):
            for key in (
                f"net.{slice_map[i]}.{layer}.weight",
                f"net.features.{layer}.weight",
            ):
                if key in sd:
                    w = sd[key].numpy().transpose(2, 3, 1, 0)
                    b = sd[key.replace("weight", "bias")].numpy()
                    convs.append((jnp.asarray(w), jnp.asarray(b)))
                    break
        for i in range(5):
            for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
                if key in sd:
                    lins.append(jnp.asarray(sd[key].numpy()[ :, :, 0, 0]))
                    break
        if len(convs) != 5:
            raise ValueError(f"unrecognized LPIPS checkpoint layout: {path}")
        if len(lins) != 5:
            lins = None
    if lins is None:
        _LOGGER.warning(
            "LPIPS linear calibration missing; using unit weights "
            "(relative comparisons remain valid)"
        )
    return convs, lins


def _alex_features(x: jnp.ndarray, convs):
    """x: [B, H, W, 3] in [-1, 1] -> list of 5 feature maps."""
    x = (x - _SHIFT) / _SCALE
    feats = []
    for (w, b), (c, k, s, p, pool) in zip(convs, _ALEX_LAYERS):
        if pool:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
            )
        x = jax.lax.conv_general_dilated(
            x, w, (s, s), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        x = jax.nn.relu(x)
        feats.append(x)
    return feats


def lpips(img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
    """LPIPS distance between [B, H, W, 3] images in [0, 1] (normalize=True
    semantics: inputs are mapped to [-1, 1])."""
    convs, lins = _load_params()
    f0 = _alex_features(img0 * 2.0 - 1.0, convs)
    f1 = _alex_features(img1 * 2.0 - 1.0, convs)
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
        d = (a - b) ** 2
        if lins is not None:
            d = d @ lins[i].reshape(-1, 1)[:, 0]
            d = d[..., None]
        else:
            d = jnp.mean(d, axis=-1, keepdims=True)
        total = total + jnp.mean(d, axis=(1, 2, 3))
    return jnp.mean(total)
