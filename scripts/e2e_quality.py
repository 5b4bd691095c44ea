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


def build_scene(
    out_dir, width=320, height=240, n_cams=24, n_gaussians=600,
    scenario="clustered",
):
    from gs_init_tpu.datasets.synthetic import (
        make_clustered_scene,
        make_scene,
        write_colmap_scene,
    )

    if scenario == "clustered":
        # SfM coverage restricted to the foreground cluster; the textured
        # background shell has zero SfM points (VERDICT round-2 item #6:
        # build the scene the method exists for).
        scene = make_clustered_scene(
            seed=3, n_cams=n_cams, width=width, height=height
        )
        n_sfm = 250  # foreground-only (points array is ordered fg-first)
    else:  # "blanket": the round-2 proxy where SfM already covers everything
        scene = make_scene(
            seed=3, n_gaussians=n_gaussians, n_cams=n_cams,
            width=width, height=height,
        )
        n_sfm = 192
    data_dir = write_colmap_scene(out_dir, scene, n_points=n_sfm)
    return scene, data_dir


def _gt_depth_oracle(scene, parser):
    """Oracle stub predictor: true SURFACE-depth maps (original scene
    frame), affine-distorted — alignment must recover scale/shift from the
    parser-space SfM points. Consumed in trainset order via a counter.

    Surface depth (dominant gaussian), not the alpha-expectation render:
    expectation blends fg with the wall behind it, corrupting the depth at
    SfM pixels by ~20% median — measured to break RANSAC alignment
    outright (recovered scale went *negative*; see synthetic.py
    render_surface_depth). Real monodepth networks predict the surface."""
    from gs_init_tpu.mdi.predictors.stub import StubPredictor

    train_ids = list(parser.split_indices("train"))
    depths = []
    for i in train_ids:
        ed = scene.surface_depths[i]
        a = scene.alphas[i]
        # Zero-coverage pixels (empty sky) carry NO depth: NaN makes the
        # stub mask them out. (The round-2 proxy filled them with the
        # median depth — every empty pixel then unprojected to a floater
        # hovering mid-scene, poisoning the mdi init.)
        depths.append(np.where(a > 0.3, ed, np.nan).astype(np.float32))

    counter = {"i": 0}

    def oracle(image, intrinsics):
        d = depths[counter["i"] % len(depths)]
        counter["i"] += 1
        return d

    return StubPredictor(oracle=oracle, scale=0.37, shift=1.3)


def run(arm, data_dir, scene, steps, result_dir, impl="auto"):
    import jax

    from gs_init_tpu.config import Config
    from gs_init_tpu.engine.runner import Runner

    # Arms: "sfm" (baseline), "monocular_depth" (pure mdi points), "sfm+mdi"
    # (the reference's include_sfm_points=True default — union init). All
    # three share the same gaussian capacity so the comparison is budgeted
    # (VERDICT r4 weak #6: unequal capacity made the win a foregone
    # conclusion).
    init_type = "sfm" if arm == "sfm" else "monocular_depth"
    cfg = Config(
        data_dir=data_dir,
        data_factor=1,
        result_dir=result_dir,
        max_steps=steps,
        test_every=8,
        sh_degree=2,
        max_gaussians=int(os.environ.get("GS_E2E_CAP", 131072)),
        init_type=init_type,
        batch_size=1,
        eval_steps=[],  # eval once, explicitly, after train() returns
        save_steps=[steps],
        tb_every=200,
        save_predictions=True,  # full render set for the eval-from-renders pass
    )
    cfg.mdi.include_sfm_points = arm == "sfm+mdi"
    # CPU smoke runs must pin --impl=pallas: "auto" trains through the XLA
    # oracle on CPU, whose lax.map backward stacks O(capacity x pixels)
    # residuals (135 GB at a 131k cap and 160x120, surfacing only at the
    # first async-dispatch fetch).
    cfg.rasterizer_impl = impl
    # Mid-run recompiles permanently degrade latency on the axon relay
    # (PERF.md); pin a generous static pair capacity instead.
    # (GS_E2E_PAIR_CAP: CPU smoke runs pin a small cap — 2M-pair arrays per
    # step make a 96x64 smoke take minutes per step on host.)
    cfg.auto_pair_capacity = False
    cfg.pair_capacity = int(os.environ.get("GS_E2E_PAIR_CAP", 1 << 21))
    cfg.strategy.refine_start_iter = 300
    cfg.strategy.refine_stop_iter = int(steps * 0.6)
    # One opacity reset mid-schedule: the reference's 30k run leaves 15k
    # recovery steps after its last reset; a compressed run with resets
    # every steps/4 leaves dense inits hazy (measured: mdi 17.05 PSNR at
    # 2k steps with one reset vs 15.4 at 6k with two).
    cfg.strategy.reset_every = max(steps // 2, 600)
    cfg.strategy.refine_every = 150
    cfg.mdi.predictor = "stub"
    cfg.mdi.use_cache = False
    cfg.mdi.subsampling.factor = 6
    # The expected-depth oracle is a mixture at silhouette boundaries
    # (fg/bg depth blend) — mask high-gradient depth pixels so boundary
    # pixels don't unproject to mid-air floaters (the reference's
    # depth_grad_mask_thresh feature, config.py:37).
    cfg.mdi.depth_gradient_mask = True

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
    runner.train()  # full product path: prefetch pipeline, retune, TB
    wall = time.time() - t0
    stats = runner.eval(steps, stage="val")
    stats["train_wall_s"] = wall
    stats["steps_per_sec"] = steps / wall
    from gs_init_tpu.engine.params import num_alive

    stats["num_gaussians"] = int(num_alive(runner.gstate))
    if "lpips" not in stats:
        stats["lpips"] = None
        stats["lpips_note"] = (
            "no pretrained AlexNet/LPIPS weights exist in this zero-egress "
            "environment; drop lpips_alex.npz in GS_TPU_CHECKPOINT_DIR and "
            "eval reports lpips automatically (ops/lpips.py)"
        )
    # Independent eval-from-renders pass over the SAVED predictions — the
    # reference's separate `nerfbaselines evaluate` stage — so the sweep
    # evaluator is exercised against real on-chip outputs (VERDICT r4 #8).
    try:
        from gs_init_tpu.evaluation.sweep import evaluate_run

        stats["eval_from_renders"] = evaluate_run(result_dir, steps)
    except Exception as e:  # noqa: BLE001 — e2e must keep its train result
        stats["eval_from_renders"] = {"error": repr(e)[:200]}
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--out", default="results/e2e")
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--cams", type=int, default=28)
    ap.add_argument("--gaussians", type=int, default=600)
    ap.add_argument(
        "--scenario", choices=["clustered", "blanket"], default="clustered"
    )
    ap.add_argument(
        "--impl", choices=["auto", "pallas", "xla"], default="auto",
        help="rasterizer impl; use pallas for CPU smoke runs (see run())",
    )
    ap.add_argument(
        "--only", choices=["sfm", "monocular_depth", "sfm+mdi"], default=None,
        help="run just one arm; other arms' stats are merged from the "
        "existing <out>/<arm>/stats/val_step<steps>.json if present "
        "(resume after an interrupted run)",
    )
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    scene, data_dir = build_scene(
        args.out, width=args.width, height=args.height,
        n_cams=args.cams, n_gaussians=args.gaussians,
        scenario=args.scenario,
    )

    results = {}
    for arm in ["sfm", "monocular_depth", "sfm+mdi"]:
        rdir = os.path.join(args.out, arm.replace("+", "_"))
        prior = os.path.join(rdir, "stats", f"val_step{args.steps}.json")
        if args.only and arm != args.only:
            if os.path.exists(prior):
                with open(prior) as f:
                    results[arm] = json.load(f)
                print(f"=== {arm}: reusing {prior} ===", flush=True)
            continue
        print(f"=== {arm} init, {args.steps} steps ===", flush=True)
        results[arm] = run(
            arm, data_dir, scene, args.steps, rdir, impl=args.impl
        )
        print(json.dumps(results[arm], indent=2, default=float), flush=True)
        # Incremental checkpoint: a wall-clock cutoff mid-run must not
        # discard the phases that DID finish (round-4 lesson — the sfm
        # phase alone is already full-scale on-chip evidence).
        with open("E2E_QUALITY.json", "w") as f:
            json.dump(
                {
                    "scenario": f"PARTIAL ({arm} phase done) "
                    f"{args.scenario} {args.width}x{args.height}",
                    "steps": args.steps,
                    "results": results,
                },
                f, indent=2, default=float,
            )

    desc = (
        f"synthetic {args.scenario} {args.width}x{args.height} / "
        f"{args.cams} cams, full mdi(stub-oracle)->train->eval pipeline"
    )
    if args.scenario == "clustered":
        desc += (
            "; SfM points restricted to the foreground cluster, textured "
            "background shell has zero SfM coverage"
        )
    with open("E2E_QUALITY.json", "w") as f:
        json.dump(
            {"scenario": desc, "steps": args.steps, "results": results},
            f,
            indent=2,
            default=float,
        )
    print("\n| init | PSNR | SSIM | LPIPS | steps/s | gaussians |")
    print("|---|---|---|---|---|---|")
    for k, v in results.items():
        lp = v.get("lpips")
        print(
            f"| {k} | {v.get('psnr', 0):.2f} | {v.get('ssim', 0):.4f} "
            f"| {'-' if lp is None else f'{lp:.4f}'} "
            f"| {v.get('steps_per_sec', 0):.1f} | {v.get('num_gaussians')} |"
        )


if __name__ == "__main__":
    main()
