#!/usr/bin/env python
"""End-to-end quality run on the hardest available proxy scene.

Zero-egress stand-in for a real MipNeRF-360 run (BASELINE.md): a multi-view
synthetic gaussian scene materialized as a COLMAP dataset (images + sparse
SfM points + per-image observations), trained through the FULL pipeline —
monocular-depth init (affine-distorted depth oracle, so alignment must
recover scale/shift from the SfM points) -> 3DGS training with
densification -> held-out eval — and compared against the SfM-point init
at the same budget (the reference's experiment design, results.md:8-15).

Writes results to E2E_QUALITY.json + prints a summary table.

Usage: python scripts/e2e_quality.py [--steps N] [--out results/e2e]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np


def build_scene(out_dir, width=320, height=240, n_cams=24, n_gaussians=600):
    from gs_init_tpu.datasets.synthetic import make_scene
    from test_datasets import _write_colmap_scene

    class _P:
        def __init__(self, p):
            self._p = p

        def __truediv__(self, other):
            return _P(os.path.join(self._p, other))

        def __str__(self):
            return self._p

        def __fspath__(self):
            return self._p

    scene = make_scene(
        seed=3, n_gaussians=n_gaussians, n_cams=n_cams,
        width=width, height=height,
    )
    data_dir = _write_colmap_scene(_P(out_dir), scene, n_points=192)
    return scene, data_dir


def _gt_depth_oracle(scene, parser):
    """Oracle stub predictor: true expected-depth maps (original scene
    frame), affine-distorted — alignment must recover scale/shift from the
    parser-space SfM points. Consumed in trainset order via a counter."""
    from gs_init_tpu.mdi.predictors.stub import StubPredictor

    train_ids = list(parser.split_indices("train"))
    depths = []
    for i in train_ids:
        ed = scene.depths[i]
        a = scene.alphas[i]
        fill = np.median(ed[a > 0.3]) if (a > 0.3).any() else 1.0
        depths.append(np.where(a > 0.3, ed, fill).astype(np.float32))

    counter = {"i": 0}

    def oracle(image, intrinsics):
        d = depths[counter["i"] % len(depths)]
        counter["i"] += 1
        return d

    return StubPredictor(oracle=oracle, scale=0.37, shift=1.3)


def run(init_type, data_dir, scene, steps, result_dir):
    import jax

    from gs_init_tpu.config import Config
    from gs_init_tpu.engine.runner import Runner

    cfg = Config(
        data_dir=data_dir,
        data_factor=1,
        result_dir=result_dir,
        max_steps=steps,
        test_every=8,
        sh_degree=2,
        max_gaussians=8192,
        pair_capacity=1 << 18,
        init_type=init_type,
        batch_size=1,
        eval_steps=[steps],
        save_steps=[steps],
        tb_every=200,
    )
    # Mid-run recompiles permanently degrade latency on the axon relay
    # (PERF.md); pin a generous static pair capacity instead.
    cfg.auto_pair_capacity = False
    cfg.pair_capacity = 1 << 19
    cfg.strategy.refine_start_iter = 300
    cfg.strategy.refine_stop_iter = int(steps * 0.6)
    cfg.strategy.reset_every = max(steps // 4, 600)
    cfg.strategy.refine_every = 150
    cfg.mdi.predictor = "stub"
    cfg.mdi.use_cache = False
    cfg.mdi.subsampling.subsample_factor = 4

    mdi_model = None
    if init_type == "monocular_depth":
        from gs_init_tpu.datasets.nerfstudio import open_dataset

        parser = open_dataset(
            data_dir, factor=1, normalize=cfg.normalize_world_space,
            test_every=cfg.test_every,
        )
        mdi_model = _gt_depth_oracle(scene, parser)
        runner = Runner(cfg, parser=parser, mdi_model=mdi_model)
    else:
        runner = Runner(cfg)
    t0 = time.time()
    for step in range(steps):
        runner.train_iteration(step)
    wall = time.time() - t0
    stats = runner.eval(steps, stage="val")
    stats["train_wall_s"] = wall
    stats["steps_per_sec"] = steps / wall
    from gs_init_tpu.engine.params import num_alive

    stats["num_gaussians"] = int(num_alive(runner.gstate))
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--out", default="results/e2e")
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--cams", type=int, default=24)
    ap.add_argument("--gaussians", type=int, default=600)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    scene, data_dir = build_scene(
        args.out, width=args.width, height=args.height,
        n_cams=args.cams, n_gaussians=args.gaussians,
    )

    results = {}
    for init_type in ["sfm", "monocular_depth"]:
        rdir = os.path.join(args.out, init_type)
        print(f"=== {init_type} init, {args.steps} steps ===", flush=True)
        results[init_type] = run(init_type, data_dir, scene, args.steps, rdir)
        print(json.dumps(results[init_type], indent=2, default=float), flush=True)

    with open("E2E_QUALITY.json", "w") as f:
        json.dump(
            {
                "scenario": "synthetic 320x240 / 24 cams / 192 SfM pts, "
                "full mdi(stub-oracle)->train->eval pipeline",
                "steps": args.steps,
                "results": results,
            },
            f,
            indent=2,
            default=float,
        )
    print("\n| init | PSNR | SSIM | steps/s | gaussians |")
    print("|---|---|---|---|---|")
    for k, v in results.items():
        print(
            f"| {k} | {v.get('psnr', 0):.2f} | {v.get('ssim', 0):.4f} "
            f"| {v.get('steps_per_sec', 0):.1f} | {v.get('num_gaussians')} |"
        )


if __name__ == "__main__":
    main()
