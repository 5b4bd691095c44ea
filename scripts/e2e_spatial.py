#!/usr/bin/env python
"""E2E for SPATIALLY-VARYING depth alignment (the interp pipeline's case).

The main proxy (e2e_quality.py) distorts oracle depth with one global
affine — solvable by plain RANSAC. Real monodepth error is spatially
varying; the reference's answer is the interpolated scale-map aligner
(depth_alignment/alignment/interp.py) and segmentation-based per-region
alignment. This script applies a HORIZONTALLY-VARYING scale to the oracle
depth (s(x) = base * (1 + amp * (x/W - 1/2)), constant shift) and trains
the mdi arm twice — alignment.method=ransac (one global fit, misaligned at
the image edges) vs =interpolate (dense scale map from per-SfM-point
ratios) — on the same clustered scene. Expectation: interpolate >= ransac.

Usage: python scripts/e2e_spatial.py [--steps N] [--out results/e2e_spatial]
CPU runs: pass --impl pallas (see e2e_quality.run's note).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _spatial_oracle(scene, parser, base=0.37, amp=0.5, shift=1.3):
    """Surface-depth oracle with horizontally-varying scale distortion.

    The stub predictor applies no further affine (scale=1, shift=0): the
    distortion lives in the returned arrays, so a global-affine aligner
    CANNOT undo it — only the scale-map aligner can.
    """
    from gs_init_tpu.mdi.predictors.stub import StubPredictor

    train_ids = list(parser.split_indices("train"))
    depths = []
    for i in train_ids:
        ed = scene.surface_depths[i]
        a = scene.alphas[i]
        h, w = ed.shape
        sx = base * (1.0 + amp * ((np.arange(w) + 0.5) / w - 0.5))
        d = ed * sx[None, :] + shift
        depths.append(np.where(a > 0.3, d, np.nan).astype(np.float32))

    counter = {"i": 0}

    def oracle(image, intrinsics):
        d = depths[counter["i"] % len(depths)]
        counter["i"] += 1
        return d

    return StubPredictor(oracle=oracle, scale=1.0, shift=0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--out", default="results/e2e_spatial")
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--cams", type=int, default=14)
    ap.add_argument("--amp", type=float, default=0.5)
    ap.add_argument("--impl", choices=["auto", "pallas", "xla"], default="auto")
    ap.add_argument(
        "--methods", nargs="*", default=["ransac", "interpolate"],
    )
    args = ap.parse_args()

    from e2e_quality import build_scene, run

    os.makedirs(args.out, exist_ok=True)
    scene, data_dir = build_scene(
        args.out, width=args.width, height=args.height, n_cams=args.cams,
        scenario="clustered",
    )

    results = {}
    for method in args.methods:
        rdir = os.path.join(args.out, f"mdi_{method}")
        print(f"=== mdi / alignment={method}, {args.steps} steps ===",
              flush=True)

        import e2e_quality as EQ

        # Reuse e2e_quality.run by monkeypatching its oracle factory and
        # adding the alignment override via a config-init tweak.
        orig = EQ._gt_depth_oracle
        EQ._gt_depth_oracle = lambda s, p: _spatial_oracle(s, p, amp=args.amp)
        orig_run = EQ.run

        def run_with_method(*a, **kw):
            import gs_init_tpu.config as C

            orig_init = C.Config.__init__

            def patched(self, *ia, **ikw):
                orig_init(self, *ia, **ikw)
                self.mdi.alignment.method = method

            C.Config.__init__ = patched
            try:
                return orig_run(*a, **kw)
            finally:
                C.Config.__init__ = orig_init

        try:
            results[method] = run_with_method(
                "monocular_depth", data_dir, scene, args.steps, rdir,
                impl=args.impl,
            )
        finally:
            EQ._gt_depth_oracle = orig
        print(json.dumps(results[method], indent=2, default=float), flush=True)

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(
            {
                "scenario": (
                    f"clustered {args.width}x{args.height}/{args.cams} cams, "
                    f"horizontally-varying depth-scale distortion amp={args.amp}; "
                    "mdi arm per alignment method"
                ),
                "steps": args.steps,
                "results": results,
            },
            f, indent=2, default=float,
        )
    print("\n| alignment | PSNR | SSIM | gaussians |")
    print("|---|---|---|---|")
    for k, v in results.items():
        print(
            f"| {k} | {v.get('psnr', 0):.2f} | {v.get('ssim', 0):.4f} "
            f"| {v.get('num_gaussians')} |"
        )


if __name__ == "__main__":
    main()
