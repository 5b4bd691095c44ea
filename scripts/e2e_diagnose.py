#!/usr/bin/env python
"""Root-cause diagnostic for the e2e proxy: where does mdi lose quality?

Separates the two hypotheses VERDICT round-2 item #6 names:
  (a) proxy design — the scene doesn't reward background coverage, or
  (b) an mdi-path quality leak (alignment, subsampling, scale init).

Measures, for sfm vs monocular_depth init on the SAME clustered scene:
  - init point stats: count, bg-region coverage fraction, scale
    percentiles, per-point distance to the nearest GT surface point
  - step-0 eval PSNR/SSIM (render of the raw init, no training)
  - optional short training curve (--steps N) with PSNR at checkpoints

Usage: python scripts/e2e_diagnose.py [--steps 0] [--out results/e2e_diag]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=0)
    ap.add_argument("--out", default="results/e2e_diag")
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--cams", type=int, default=28)
    ap.add_argument("--eval-at", type=int, nargs="*", default=[])
    ap.add_argument(
        "--no-eval", action="store_true",
        help="skip step-0 rendering (CPU runs: interpret-mode Pallas is slow)",
    )
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from e2e_quality import build_scene, _gt_depth_oracle

    os.makedirs(args.out, exist_ok=True)
    scene, data_dir = build_scene(
        args.out, width=args.width, height=args.height, n_cams=args.cams,
        scenario="clustered",
    )
    gt_pts = np.asarray(scene.points)  # [N, 3] true gaussian centers

    from gs_init_tpu.config import Config
    from gs_init_tpu.engine.runner import Runner
    from gs_init_tpu.datasets.nerfstudio import open_dataset

    report = {}
    for init_type in ["sfm", "monocular_depth"]:
        rdir = os.path.join(args.out, init_type)
        cfg = Config(
            data_dir=data_dir, data_factor=1, result_dir=rdir,
            max_steps=max(args.steps, 1), test_every=8, sh_degree=2,
            max_gaussians=131072, init_type=init_type, batch_size=1,
            eval_steps=[], save_steps=[], tb_every=10**9,
        )
        cfg.auto_pair_capacity = False
        cfg.pair_capacity = 1 << 21
        cfg.strategy.refine_start_iter = 300
        cfg.strategy.refine_stop_iter = int(max(args.steps, 1) * 0.6)
        cfg.strategy.reset_every = max(max(args.steps, 1) // 2, 600)
        cfg.strategy.refine_every = 150
        cfg.mdi.predictor = "stub"
        cfg.mdi.use_cache = False
        cfg.mdi.subsampling.factor = 6
        cfg.mdi.depth_gradient_mask = True

        parser = open_dataset(
            data_dir, factor=1, normalize=cfg.normalize_world_space,
            test_every=cfg.test_every,
        )
        mdi_model = (
            _gt_depth_oracle(scene, parser)
            if init_type == "monocular_depth"
            else None
        )
        runner = Runner(cfg, parser=parser, mdi_model=mdi_model)

        # ----- init point statistics (in PARSER/world-normalized space, so
        # transform GT points with the parser's normalization too)
        from gs_init_tpu.engine.params import num_alive

        alive = np.asarray(runner.gstate.alive)
        means = np.asarray(runner.gstate.params.means)[alive]
        scales = np.exp(np.asarray(runner.gstate.params.scales)[alive])
        T = getattr(parser, "transform", None)
        if T is not None:
            T = np.asarray(T)
            gt_n = gt_pts @ T[:3, :3].T + T[:3, 3]
        else:
            gt_n = gt_pts
        # nearest-GT distance for a subsample of init points
        sub = means[
            np.random.default_rng(0).choice(
                len(means), min(4000, len(means)), replace=False
            )
        ]
        d2 = ((sub[:, None, :] - gt_n[None, :, :]) ** 2).sum(-1)
        nn = np.sqrt(d2.min(axis=1))
        # background = GT radius > 4 in ORIGINAL frame; measure what
        # fraction of init points normalize-transform back into that shell
        if T is not None:
            R, t = T[:3, :3], T[:3, 3]
            means_orig = (means - t) @ np.linalg.inv(R).T
        else:
            means_orig = means
        r_xz = np.sqrt(means_orig[:, 0] ** 2 + means_orig[:, 2] ** 2)
        bg_frac = float((r_xz > 4.0).mean())
        gt_bg_frac = float(
            (np.sqrt(gt_pts[:, 0] ** 2 + gt_pts[:, 2] ** 2) > 4.0).mean()
        )

        stats = {
            "n_init": int(num_alive(runner.gstate)),
            "init_bg_fraction": bg_frac,
            "gt_bg_fraction": gt_bg_frac,
            "nn_dist_to_gt_p50": float(np.percentile(nn, 50)),
            "nn_dist_to_gt_p90": float(np.percentile(nn, 90)),
            "nn_dist_to_gt_max": float(nn.max()),
            "scale_p50": float(np.percentile(scales, 50)),
            "scale_p90": float(np.percentile(scales, 90)),
            "scale_p99": float(np.percentile(scales, 99)),
            "scale_max": float(scales.max()),
            "scene_scale": float(runner.scene_scale),
        }
        if not args.no_eval:
            ev0 = runner.eval(0, stage="val")
            stats["step0_psnr"] = float(ev0["psnr"])
            stats["step0_ssim"] = float(ev0["ssim"])
        print(f"[{init_type}] {json.dumps(stats)}", flush=True)

        curve = {}
        if args.steps > 0:
            t0 = time.time()
            marks = set(args.eval_at) | {args.steps}
            for step in range(args.steps):
                runner.train_iteration(step)
                if (step + 1) in marks:
                    ev = runner.eval(step + 1, stage="val")
                    curve[str(step + 1)] = {
                        "psnr": float(ev["psnr"]),
                        "ssim": float(ev["ssim"]),
                        "n_gs": int(num_alive(runner.gstate)),
                    }
                    print(
                        f"[{init_type}] step {step+1}: {curve[str(step+1)]}",
                        flush=True,
                    )
            stats["train_wall_s"] = time.time() - t0
        stats["curve"] = curve
        report[init_type] = stats

    with open(os.path.join(args.out, "diagnosis.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
