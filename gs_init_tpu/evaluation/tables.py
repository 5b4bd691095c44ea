"""Results table generation from sweep outputs.

Equivalent of the reference's results_processing_scripts/make_results_table.py:
collect eval stats JSONs across (scene, preset) runs, aggregate per-scene
metrics into markdown/latex tables with best-value highlighting.
"""
from __future__ import annotations

import glob
import json
import os
import re
from typing import Dict, List, Optional, Sequence

METRICS = ["psnr", "ssim", "lpips", "cc_psnr", "num_GS", "ellipse_time"]
HIGHER_BETTER = {"psnr": True, "ssim": True, "lpips": False, "cc_psnr": True}


def collect_results(output_root: str, step: Optional[int] = None) -> List[dict]:
    """Scan <output_root>/<scene>/<preset_runid>/stats/val_step*.json."""
    rows = []
    for stats_path in glob.glob(
        os.path.join(output_root, "*", "*", "stats", "val_step*.json")
    ):
        m = re.search(r"val_step(\d+)\.json$", stats_path)
        if not m:
            continue
        s = int(m.group(1))
        run_dir = os.path.dirname(os.path.dirname(stats_path))
        scene = os.path.basename(os.path.dirname(run_dir))
        preset = os.path.basename(run_dir)
        preset = re.sub(r"_[0-9a-f]{12}$", "", preset)
        rows.append(
            dict(
                scene=scene,
                preset=preset,
                step=s,
                **json.load(open(stats_path)),
            )
        )
    if step is not None:
        rows = [r for r in rows if r["step"] == step]
    else:
        # Keep only the latest step per (scene, preset).
        latest: Dict[tuple, dict] = {}
        for r in rows:
            k = (r["scene"], r["preset"])
            if k not in latest or r["step"] > latest[k]["step"]:
                latest[k] = r
        rows = list(latest.values())
    return rows


def make_table(
    rows: List[dict],
    metric: str = "psnr",
    fmt: str = "markdown",
    decimals: int = 3,
) -> str:
    """One row per preset, one column per scene + average; best bolded."""
    scenes = sorted({r["scene"] for r in rows})
    presets = sorted({r["preset"] for r in rows})
    values: Dict[str, Dict[str, float]] = {p: {} for p in presets}
    for r in rows:
        if metric in r:
            values[r["preset"]][r["scene"]] = float(r[metric])
    for p in presets:
        vals = [values[p][s] for s in scenes if s in values[p]]
        if vals:
            values[p]["__avg__"] = sum(vals) / len(vals)

    cols = scenes + ["__avg__"]
    best: Dict[str, float] = {}
    hb = HIGHER_BETTER.get(metric, True)
    for c in cols:
        col_vals = [values[p][c] for p in presets if c in values[p]]
        if col_vals:
            best[c] = max(col_vals) if hb else min(col_vals)

    def cell(p, c):
        if c not in values[p]:
            return "-"
        v = values[p][c]
        s = f"{v:.{decimals}f}"
        if c in best and abs(v - best[c]) < 10 ** (-decimals) / 2:
            s = f"**{s}**" if fmt == "markdown" else rf"\textbf{{{s}}}"
        return s

    header = ["preset"] + scenes + ["avg"]
    if fmt == "markdown":
        lines = [
            "| " + " | ".join(header) + " |",
            "|" + "|".join(["---"] * len(header)) + "|",
        ]
        for p in presets:
            lines.append(
                "| " + " | ".join([p] + [cell(p, c) for c in cols]) + " |"
            )
        return "\n".join(lines)
    if fmt == "latex":
        lines = [
            r"\begin{tabular}{l" + "r" * (len(cols)) + "}",
            " & ".join(header) + r" \\ \hline",
        ]
        for p in presets:
            lines.append(
                " & ".join([p] + [cell(p, c) for c in cols]) + r" \\"
            )
        lines.append(r"\end{tabular}")
        return "\n".join(lines)
    raise ValueError(f"unknown format {fmt!r}")


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="make results tables")
    ap.add_argument("--output_root", required=True)
    ap.add_argument("--metrics", nargs="+", default=["psnr", "ssim"])
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--format", default="markdown", choices=["markdown", "latex"])
    ns = ap.parse_args(argv)
    rows = collect_results(ns.output_root, ns.step)
    for metric in ns.metrics:
        print(f"\n## {metric}\n")
        print(make_table(rows, metric, ns.format))


if __name__ == "__main__":
    main()
