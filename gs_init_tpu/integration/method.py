"""Benchmark-harness integration (nerfbaselines-style Method).

The reference integrates with nerfbaselines by AST-rewriting its own
runner at import time (nerfbaselines_integration/method.py:345-547). Our
engine exposes setup_train / train_iteration / save / render natively, so
this Method is a thin adapter:

- get_info / get_train_iteration / save / render — the nerfbaselines Method
  protocol (method.py:550+)
- config_overrides with typed casting (the reference's cast_value,
  method.py:45-94) reuses our CLI's dot-path setter
- checkpoint load restores full state incl. the parser normalization
  transform (method.py:562-605 stores it as base64 numpy; ours lives in the
  npz checkpoint)
- optimize_embedding: test-time per-image appearance-embedding fit (128
  Adam steps, method.py:779-865)

Registration with the real nerfbaselines registry is gated on the package
being importable (it is not part of this environment).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, apply_overrides
from ..engine.runner import Runner
from ..trainer import build_presets

DATASET_PRESETS: Dict[str, Dict[str, str]] = {
    # Reference method_spec.py:5-65 presets.
    "blender": {"init_type": "random", "random_bkgd": "true"},
    "phototourism": {"app_opt": "true", "max_steps": "100000"},
}


class GsInitTpuMethod:
    """Train/eval adapter around the Runner with a stable external API."""

    def __init__(
        self,
        data_dir: Optional[str] = None,
        checkpoint: Optional[str] = None,
        preset: str = "default",
        config_overrides: Optional[Dict[str, str]] = None,
        dataset_kind: Optional[str] = None,
    ):
        cfg = build_presets()[preset]
        if dataset_kind and dataset_kind in DATASET_PRESETS:
            apply_overrides(cfg, DATASET_PRESETS[dataset_kind])
        if data_dir:
            cfg.data_dir = data_dir
        if config_overrides:
            apply_overrides(cfg, {k: str(v) for k, v in config_overrides.items()})
        cfg.adjust_steps()
        self.cfg = cfg
        self.runner = Runner(cfg)
        self.step = 0
        if checkpoint:
            self.step = self.runner.load(checkpoint)

    # ------------------------------------------------------------- protocol

    def get_info(self) -> Dict[str, Any]:
        from ..engine.params import num_alive

        return dict(
            name="gs-init-tpu",
            num_iterations=self.cfg.max_steps,
            loaded_step=self.step,
            num_gaussians=int(num_alive(self.runner.gstate)),
            supported_camera_models=["pinhole", "ortho", "fisheye"],
        )

    def setup_train(self):
        self.runner.setup_train()
        return self

    def train_iteration(self, step: int) -> Dict[str, float]:
        metrics = self.runner.train_iteration(step)
        self.step = step
        return {k: float(v) for k, v in metrics.items()}

    def save(self, path: Optional[str] = None) -> str:
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        out = self.runner.save(self.step)
        if path and path != out:
            import shutil

            shutil.copy(out, path)
            out = path
        return out

    def render(
        self, camtoworld: np.ndarray, K: np.ndarray, width: int, height: int
    ) -> Dict[str, np.ndarray]:
        color, alpha, depth = self.runner.render(
            camtoworld, K, width, height, render_mode="RGB+ED"
        )
        return dict(color=color, accumulation=alpha, depth=depth)

    # -------------------------------------------------- test-time embedding

    def optimize_embedding(
        self,
        image: np.ndarray,  # [H, W, 3] float
        camtoworld: np.ndarray,
        K: np.ndarray,
        n_steps: int = 128,
        lr: float = 0.1,
    ) -> np.ndarray:
        """Fit a fresh per-image appearance embedding on a held-out view
        (test-time adaptation, reference method.py:779-865). Requires
        cfg.app_opt."""
        if self.runner.aux.app is None:
            raise RuntimeError("optimize_embedding requires app_opt=true")
        runner = self.runner
        cfg = self.cfg
        h, w = image.shape[:2]
        app = runner.aux.app
        params = runner.gstate.params
        scales, opac = params.activated()
        viewmat = jnp.linalg.inv(jnp.asarray(camtoworld, jnp.float32))[None]
        target = jnp.asarray(image, jnp.float32)[None]

        from ..engine.appearance import appearance_colors
        from ..ops.render import rasterize

        def loss_fn(embed):
            app2 = app._replace(embeds=embed[None])
            dirs = params.means[None] - jnp.asarray(camtoworld)[None, None, :3, 3]
            resid = appearance_colors(
                app2, jnp.zeros((1,), jnp.int32), dirs,
                jnp.int32(cfg.sh_degree), cfg.sh_degree,
            )
            colors = jax.nn.sigmoid(resid + params.sh0[None, :, 0, :])
            render, _, _ = rasterize(
                params.means, params.quats, scales, opac, colors,
                viewmat, jnp.asarray(K, jnp.float32)[None], w, h,
                alive=runner.gstate.alive, impl=cfg.rasterizer_impl,
                pair_capacity=cfg.pair_capacity,
            )
            return jnp.mean((render - target) ** 2)

        grad_fn = jax.jit(jax.value_and_grad(loss_fn))
        embed = jnp.zeros((app.embeds.shape[-1],))
        m = jnp.zeros_like(embed)
        v = jnp.zeros_like(embed)
        for i in range(n_steps):
            _, g = grad_fn(embed)
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            mh = m / (1 - 0.9 ** (i + 1))
            vh = v / (1 - 0.999 ** (i + 1))
            embed = embed - lr * mh / (jnp.sqrt(vh) + 1e-8)
        return np.asarray(embed)


def register_with_nerfbaselines():  # pragma: no cover - optional dependency
    """Register the method spec when nerfbaselines is installed."""
    try:
        from nerfbaselines import register
    except ImportError:
        return False
    register(
        {
            "id": "gs-init-tpu",
            "method_class": f"{__name__}:GsInitTpuMethod",
            "conda": {"environment_name": "gs_init_tpu", "python_version": "3.12"},
            "metadata": {
                "name": "gs-init-tpu",
                "description": "TPU-native 3DGS with monocular depth init",
            },
            "presets": DATASET_PRESETS,
        }
    )
    return True
