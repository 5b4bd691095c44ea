#!/usr/bin/env python
"""Depth-init throughput benchmark: batched predictor inference, imgs/sec.

BASELINE.json's first metric is "depth-init imgs/sec" — the reference runs
its predictors one image at a time (monocular_depth_init.py:120-177); ours
batches through the flax net (mdi/predictors/*.predict_depth_batch). Random
weights are fine for throughput. Prints one JSON line per (predictor,
batch) config.

Usage: python scripts/bench_depth.py [--predictor dav2|metric3d]
       [--width 1296] [--height 840] [--batches 1 4 8] [--reps 8]
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
    ap.add_argument("--predictor", default="dav2", choices=["dav2", "metric3d"])
    ap.add_argument("--backbone", default="vits")
    ap.add_argument("--width", type=int, default=1296)
    ap.add_argument("--height", type=int, default=840)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 8])
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    from gs_init_tpu.mdi.predictors.interface import CameraIntrinsics

    if args.predictor == "dav2":
        from gs_init_tpu.mdi.predictors.depth_anything_v2 import (
            DepthAnythingV2Predictor,
        )

        model = DepthAnythingV2Predictor(backbone=args.backbone)
    else:
        from gs_init_tpu.mdi.predictors.metric3d import Metric3DPredictor

        model = Metric3DPredictor(
            backbone={"vits": "small", "vitl": "large"}.get(
                args.backbone, "small"
            ),
            allow_random_weights=True,
        )

    rng = np.random.default_rng(0)
    intr = CameraIntrinsics(
        fx=0.85 * args.width, fy=0.85 * args.width,
        cx=args.width / 2, cy=args.height / 2,
    )
    for b in args.batches:
        imgs = rng.uniform(0, 1, (b, args.height, args.width, 3)).astype(
            np.float32
        )
        # Warmup (compile + first relay fetch).
        model.predict_depth_batch(imgs, [intr] * b)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            # predict_depth_batch fetches to host each call — that IS the
            # production pattern (mdi/init.py consumes numpy per batch), so
            # the relay round trip is honestly part of the metric.
            model.predict_depth_batch(imgs, [intr] * b)
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "metric": f"depth_init_imgs_per_sec_{args.predictor}_"
                    f"{args.backbone}_b{b}_{args.width}x{args.height}",
                    "value": round(args.reps * b / dt, 3),
                    "unit": "imgs/s",
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
