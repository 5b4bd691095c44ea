#!/usr/bin/env python
"""Mini-sweep demo: drive evaluation/sweep.py end-to-end as a SYSTEM.

plan -> train (subprocess trainer, exactly as a cluster run would) ->
evaluate-from-renders -> prune -> markdown tables with TB readback —
the reference's nerfbaselines_evaluator.py workflow (plan/launch at
:400-530, evaluate :691-700, prune :531-560, tables via results scripts)
on a synthetic COLMAP scene with two config strings.

Writes results/sweep_demo/{<runs>, table.md} and prints the table.

Usage: python scripts/sweep_demo.py [--steps 400] [--out results/sweep_demo]
       [--impl pallas|xla]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--out", default="results/sweep_demo")
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--height", type=int, default=120)
    ap.add_argument("--cams", type=int, default=12)
    ap.add_argument("--impl", default="auto", choices=["auto", "pallas", "xla"])
    ap.add_argument("--cap", type=int, default=16384)
    args = ap.parse_args()

    from gs_init_tpu.datasets.synthetic import make_clustered_scene, write_colmap_scene
    from gs_init_tpu.evaluation.sweep import execute_sweep
    from gs_init_tpu.evaluation.tables import collect_results, make_table

    data_root = os.path.join(args.out, "data")
    os.makedirs(data_root, exist_ok=True)
    scene = make_clustered_scene(
        seed=3, n_cams=args.cams, width=args.width, height=args.height
    )
    # write_colmap_scene materializes under <out>/scene; the sweep expects
    # <data_root>/<scene_name>.
    written = write_colmap_scene(data_root, scene, n_points=250)
    toy = os.path.join(data_root, "toy")
    if not os.path.isdir(toy):
        os.rename(written, toy)

    output_root = os.path.join(args.out, "runs")
    extra = [
        f"--max_steps={args.steps}",
        f"--eval_steps=[{args.steps}]",
        f"--save_steps=[{args.steps}]",
        f"--max_gaussians={args.cap}",
        f"--rasterizer_impl={args.impl}",
        "--pair_capacity=262144",
        "--auto_pair_capacity=false",
        "--data_factor=1",
        "--test_every=6",
        "--sh_degree=1",
        "--tb_every=100",
        "--save_predictions=true",
        "--strategy.refine_start_iter=100",
        "--strategy.refine_every=100",
        f"--strategy.refine_stop_iter={int(args.steps * 0.6)}",
        "--strategy.reset_every=100000",
        "--mdi.predictor=stub",
        "--mdi.use_cache=false",
        "--mdi.subsampling.factor=8",
    ]
    # Two config strings: the init-type axis (the sweep's reason to exist,
    # reference results.md rows) and an appearance-axis single run.
    configs = [
        "default --init_type={sfm,monocular_depth}",
        "default --init_type=sfm --sort_bf16=false",
    ]
    runs = execute_sweep(
        data_root, ["toy"], configs, output_root,
        extra_args=extra, evaluate=True, prune=True,
    )
    done = [r for r in runs if r.done]
    print(f"[sweep_demo] {len(done)}/{len(runs)} runs completed")

    rows = collect_results(output_root)
    table = make_table(rows)
    table_path = os.path.join(args.out, "table.md")
    with open(table_path, "w") as f:
        f.write(table)
    print(table)
    summary = {
        "runs": [
            {"run_id": r.run_id, "done": r.done, "out_dir": r.out_dir}
            for r in runs
        ],
        "table": table_path,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    if len(done) != len(runs):
        sys.exit(1)


if __name__ == "__main__":
    main()
