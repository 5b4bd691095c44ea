"""Evaluation sweep orchestrator — scene x config grid runner.

Equivalent of the reference's nerfbaselines_evaluator.py: config strings
like

    "{default,mcmc} --mdi.predictor={depth_anything_v2,stub}"
    "default --mdi.alignment.method=[ALL]"

expand to the cartesian product of presets and dot-path overrides ([ALL]
enumerates a Literal field's members via dataclass reflection,
nerfbaselines_evaluator.py:242-283). Each (scene, combination) becomes a
trainer subprocess with a deterministic run id; completed runs (matching
run-id stamp) are skipped, stale outputs are backed up
(nerfbaselines_evaluator.py:463-488). SLURM array sharding splits the grid
across jobs (:703-741). Per-scene MCMC gaussian caps mirror :514-524.
"""
from __future__ import annotations

import dataclasses
import hashlib
import itertools
import json
import os
import shutil
import subprocess
import sys
import typing
from typing import Dict, List, Optional, Sequence, Tuple

from ..config import Config

# Reference per-scene MCMC caps (nerfbaselines_evaluator.py:514-524),
# scaled to our capacity knob.
MCMC_SCENE_CAPS = {
    "garden": 6_000_000,
    "bicycle": 6_100_000,
    "stump": 4_750_000,
    "bonsai": 4_800_000,
    "counter": 4_000_000,
    "kitchen": 4_400_000,
    "room": 3_700_000,
    "treehill": 5_200_000,
    "flowers": 5_300_000,
}

ParamList = Tuple[Tuple[str, str], ...]


def all_values_of_param(name: str) -> List[str]:
    """Enumerate a Literal config field's members by dot path."""
    cur = Config
    for part in name.replace("-", "_").split("."):
        hints = typing.get_type_hints(cur)
        if part not in hints:
            raise AttributeError(f"no config field {name!r} (at {part!r})")
        cur = hints[part]
    origin = typing.get_origin(cur)
    if origin is typing.Union:
        args = [a for a in typing.get_args(cur) if a is not type(None)]
        if len(args) == 1:
            cur = args[0]
            origin = typing.get_origin(cur)
    if origin is typing.Literal:
        vals = [str(v) for v in typing.get_args(cur)]
        if not vals:
            raise RuntimeError(f"empty literal for {name}")
        return vals
    raise ValueError(f"cannot enumerate values of {name}: {cur}")


def _split_top_level(s: str) -> List[str]:
    parts, cur, depth = [], "", 0
    for ch in s:
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
        if ch == " " and depth == 0:
            if cur:
                parts.append(cur)
            cur = ""
        else:
            cur += ch
    if cur:
        parts.append(cur)
    return parts


def parse_config_string(config_str: str) -> List[ParamList]:
    """Expand a grid string to a list of (key, value) combination tuples.

    The first token may be a brace set of presets: "{default,mcmc}" or a
    bare preset name; remaining tokens are --key={v1,v2}, --key=value, or
    --key=[ALL].
    """
    parts = _split_top_level(config_str.strip())
    if not parts:
        raise ValueError("empty config string")
    axes: List[List[Tuple[str, str]]] = []

    first = parts[0]
    if not first.startswith("-"):
        presets = (
            [v.strip() for v in first[1:-1].split(",")]
            if first.startswith("{")
            else [first]
        )
        axes.append([("__preset__", p) for p in presets])
        parts = parts[1:]

    for part in parts:
        if "=" not in part:
            raise ValueError(f"expected key=value in {part!r}")
        key, value = part.split("=", 1)
        key = key.lstrip("-")
        if value == "[ALL]":
            vals = all_values_of_param(key)
        elif value.startswith("{"):
            if not value.endswith("}"):
                raise ValueError(f"unclosed brace in {part!r}")
            vals = [v.strip() for v in value[1:-1].split(",") if v.strip()]
        else:
            vals = [value]
        axes.append([(key, v) for v in vals])
    combos = sorted(set(itertools.product(*axes)))
    return [tuple(c) for c in combos]


def run_id_of(scene: str, combo: ParamList) -> str:
    blob = json.dumps([scene, list(combo)], sort_keys=True)
    return hashlib.sha1(blob.encode()).hexdigest()[:12]


def combo_name(combo: ParamList) -> str:
    parts = []
    for k, v in combo:
        if k == "__preset__":
            parts.append(v)
        else:
            parts.append(f"{k.split('.')[-1]}={v}")
    return "_".join(parts).replace("/", "-")


@dataclasses.dataclass
class SweepRun:
    scene: str
    combo: ParamList
    run_id: str
    out_dir: str
    done: bool = False


def plan_sweep(
    data_root: str,
    scenes: Sequence[str],
    config_strings: Sequence[str],
    output_root: str,
) -> List[SweepRun]:
    runs = []
    for cfg_str in config_strings:
        for combo in parse_config_string(cfg_str):
            for scene in scenes:
                rid = run_id_of(scene, combo)
                out = os.path.join(
                    output_root, scene, f"{combo_name(combo)}_{rid}"
                )
                stamp = os.path.join(out, "run_id.json")
                done = False
                if os.path.exists(stamp):
                    try:
                        done = json.load(open(stamp))["run_id"] == rid and (
                            os.path.exists(
                                os.path.join(out, "stats", "train_final.json")
                            )
                        )
                    except Exception:
                        done = False
                if os.path.exists(out) and not done:
                    # Stale/mismatched output: back it up (reference :53-76).
                    shutil.move(out, out + ".bak")
                runs.append(
                    SweepRun(
                        scene=scene, combo=combo, run_id=rid, out_dir=out,
                        done=done,
                    )
                )
    return runs


def shard_for_slurm(runs: List[SweepRun]) -> List[SweepRun]:
    """Filter the run list to this SLURM array shard (reference :703-741)."""
    tid = os.environ.get("SLURM_ARRAY_TASK_ID")
    cnt = os.environ.get("SLURM_ARRAY_TASK_COUNT")
    if tid is None or cnt is None:
        return runs
    tid, cnt = int(tid), int(cnt)
    return [r for i, r in enumerate(runs) if i % cnt == tid]


def train_command(run: SweepRun, data_root: str, extra: Sequence[str] = ()):
    preset = "default"
    args = []
    for k, v in run.combo:
        if k == "__preset__":
            preset = v
        else:
            args.append(f"--{k}={v}")
    if preset == "mcmc" and run.scene in MCMC_SCENE_CAPS and not any(
        a.startswith("--strategy.cap_max") for a in args
    ):
        args.append(f"--strategy.cap_max={MCMC_SCENE_CAPS[run.scene]}")
    return [
        sys.executable,
        "-m",
        "gs_init_tpu.trainer",
        preset,
        f"--data_dir={os.path.join(data_root, run.scene)}",
        f"--result_dir={run.out_dir}",
        *args,
        *extra,
    ]


def execute_sweep(
    data_root: str,
    scenes: Sequence[str],
    config_strings: Sequence[str],
    output_root: str,
    extra_args: Sequence[str] = (),
    dry_run: bool = False,
) -> List[SweepRun]:
    runs = shard_for_slurm(
        plan_sweep(data_root, scenes, config_strings, output_root)
    )
    for run in runs:
        if run.done:
            print(f"[sweep] skip (done): {run.out_dir}")
            continue
        cmd = train_command(run, data_root, extra_args)
        print(f"[sweep] run: {' '.join(cmd)}")
        if dry_run:
            continue
        os.makedirs(run.out_dir, exist_ok=True)
        with open(os.path.join(run.out_dir, "run_id.json"), "w") as f:
            json.dump({"run_id": run.run_id, "combo": list(run.combo)}, f)
        res = subprocess.run(cmd)
        if res.returncode != 0:
            print(f"[sweep] FAILED ({res.returncode}): {run.out_dir}")
        else:
            run.done = True
    return runs


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="scene x config sweep")
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--scenes", nargs="+", required=True)
    ap.add_argument("--configs", nargs="+", required=True)
    ap.add_argument("--output_root", required=True)
    ap.add_argument("--dry_run", action="store_true")
    # Single string, shlex-split (argparse would eat leading-dash items).
    ap.add_argument("--extra", default="", help="extra trainer flags, quoted")
    ns = ap.parse_args(argv)
    import shlex

    execute_sweep(
        ns.data_root, ns.scenes, ns.configs, ns.output_root,
        extra_args=shlex.split(ns.extra), dry_run=ns.dry_run,
    )


if __name__ == "__main__":
    main()
