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
HIGHER_BETTER = {
    "psnr": True, "ssim": True, "lpips": False, "cc_psnr": True,
    "tb_train/loss": False, "tb_train/mem_peak_gb": False,
}

# Train-time scalars merged into table rows from TensorBoard event files
# (reference parameters.py:10-30 + nerfbaselines_evaluator.py:491-511 read
# num_GS / memory / timing back out of TB rather than stats JSON).
DEFAULT_TB_TAGS = ["train/num_GS", "train/loss", "train/mem_peak_gb"]


def read_tb_scalars(
    run_dir: str,
    tags: Optional[Sequence[str]] = None,
    step: Optional[int] = None,
) -> Dict[str, float]:
    """Read scalar values from a run's TB event files.

    Returns ``{tag: value}`` — the value at ``step`` if given (exact match,
    like the reference's TensorboardDataLoader.read_param), else the
    last-logged value (read_param_from_last_tensorboard_step,
    nerfbaselines_evaluator.py:491-511). Missing tags are simply absent
    from the result; a missing/corrupt event file yields an empty dict.
    """
    tb_dir = os.path.join(run_dir, "tb")
    if not os.path.isdir(tb_dir):
        return {}
    try:
        from tensorboard.backend.event_processing import event_accumulator
    except ImportError:
        return {}
    out: Dict[str, float] = {}
    try:
        ea = event_accumulator.EventAccumulator(
            tb_dir, size_guidance={event_accumulator.SCALARS: 0}
        )
        ea.Reload()
        avail = ea.Tags().get("scalars", [])
        for tag in tags or avail:
            if tag not in avail:
                continue
            scalars = ea.Scalars(tag)
            if not scalars:
                continue
            if step is None:
                out[tag] = float(scalars[-1].value)
            else:
                for s in scalars:
                    if s.step == step:
                        out[tag] = float(s.value)
                        break
    except Exception:
        return {}
    return out


def collect_results(
    output_root: str,
    step: Optional[int] = None,
    tb_tags: Optional[Sequence[str]] = DEFAULT_TB_TAGS,
) -> List[dict]:
    """Scan <output_root>/<scene>/<preset_runid>/stats/val_step*.json.

    When ``tb_tags`` is non-empty, each row additionally carries train-time
    TB scalars as ``tb_<tag>`` columns (last-logged value).
    """
    rows = []
    tb_cache: Dict[str, Dict[str, float]] = {}
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
        if tb_tags and run_dir not in tb_cache:
            tb_cache[run_dir] = {
                f"tb_{k}": v
                for k, v in read_tb_scalars(run_dir, tb_tags).items()
            }
        rows.append(
            dict(
                scene=scene,
                preset=preset,
                step=s,
                **json.load(open(stats_path)),
                **tb_cache.get(run_dir, {}),
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
