"""Sweep grid expansion, run planning, results tables."""
import json
import os

import numpy as np
import pytest

from gs_init_tpu.evaluation.sweep import (
    all_values_of_param,
    combo_name,
    parse_config_string,
    plan_sweep,
    run_id_of,
    shard_for_slurm,
    train_command,
)
from gs_init_tpu.evaluation.tables import collect_results, make_table


def test_parse_config_string_product():
    combos = parse_config_string(
        "{default,mcmc} --mdi.predictor={stub,depth_anything_v2} --sh_degree=2"
    )
    assert len(combos) == 4
    for c in combos:
        d = dict(c)
        assert d["__preset__"] in ("default", "mcmc")
        assert d["mdi.predictor"] in ("stub", "depth_anything_v2")
        assert d["sh_degree"] == "2"


def test_parse_config_string_all_expansion():
    vals = all_values_of_param("mdi.alignment.method")
    assert set(vals) == {"lstsqrs", "ransac", "msac", "interpolate"}
    combos = parse_config_string("default --mdi.alignment.method=[ALL]")
    assert len(combos) == 4


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_config_string("default --bad")
    with pytest.raises(ValueError):
        parse_config_string("default --k={a,b")
    with pytest.raises(AttributeError):
        all_values_of_param("nonexistent.path")


def test_run_planning_and_stamp(tmp_path):
    root = str(tmp_path / "out")
    runs = plan_sweep("/data", ["garden", "room"], ["{default,mcmc}"], root)
    assert len(runs) == 4
    assert all(not r.done for r in runs)
    rids = {r.run_id for r in runs}
    assert len(rids) == 4  # unique per (scene, combo)
    # Mark one run complete; re-planning should see it done.
    r0 = runs[0]
    os.makedirs(os.path.join(r0.out_dir, "stats"), exist_ok=True)
    json.dump({"run_id": r0.run_id}, open(os.path.join(r0.out_dir, "run_id.json"), "w"))
    json.dump({}, open(os.path.join(r0.out_dir, "stats", "train_final.json"), "w"))
    runs2 = plan_sweep("/data", ["garden", "room"], ["{default,mcmc}"], root)
    assert sum(r.done for r in runs2) == 1
    # Stale stamp -> backed up, not done.
    json.dump({"run_id": "stale"}, open(os.path.join(r0.out_dir, "run_id.json"), "w"))
    runs3 = plan_sweep("/data", ["garden", "room"], ["{default,mcmc}"], root)
    assert sum(r.done for r in runs3) == 0
    assert os.path.exists(r0.out_dir + ".bak")


def test_slurm_sharding(tmp_path, monkeypatch):
    runs = plan_sweep("/d", ["a", "b", "c"], ["{default,mcmc}"], str(tmp_path))
    monkeypatch.setenv("SLURM_ARRAY_TASK_ID", "1")
    monkeypatch.setenv("SLURM_ARRAY_TASK_COUNT", "2")
    shard = shard_for_slurm(runs)
    assert len(shard) == 3
    monkeypatch.setenv("SLURM_ARRAY_TASK_ID", "0")
    shard0 = shard_for_slurm(runs)
    ids = {r.run_id for r in shard} | {r.run_id for r in shard0}
    assert len(ids) == 6


def test_train_command_mcmc_caps(tmp_path):
    runs = plan_sweep("/data", ["garden"], ["mcmc"], str(tmp_path))
    cmd = train_command(runs[0], "/data")
    assert "mcmc" in cmd
    assert any("cap_max=6000000" in a for a in cmd)
    assert any(a == "--data_dir=/data/garden" for a in cmd)


def test_results_tables(tmp_path):
    root = tmp_path / "out"
    data = {
        ("garden", "default_abc123456789"): dict(psnr=27.5, ssim=0.81),
        ("garden", "mcmc_abc123456789"): dict(psnr=27.9, ssim=0.83),
        ("room", "default_abc123456789"): dict(psnr=31.0, ssim=0.90),
        ("room", "mcmc_abc123456789"): dict(psnr=30.5, ssim=0.91),
    }
    for (scene, preset), stats in data.items():
        d = root / scene / preset / "stats"
        d.mkdir(parents=True)
        json.dump(stats, open(d / "val_step7000.json", "w"))
        json.dump(
            {k: v + 0.1 for k, v in stats.items()},
            open(d / "val_step30000.json", "w"),
        )
    rows = collect_results(str(root))
    assert len(rows) == 4
    assert all(r["step"] == 30000 for r in rows)  # latest step wins
    table = make_table(rows, "psnr")
    assert "| preset | garden | room | avg |" in table
    assert "**31.1" in table  # best-in-column bolded (room default)
    assert "**28.0" in table  # garden mcmc
    latex = make_table(rows, "psnr", fmt="latex")
    assert r"\textbf{31.1" in latex
    rows7k = collect_results(str(root), step=7000)
    assert all(r["step"] == 7000 for r in rows7k)


def test_patch_metrics_localize_error(rng):
    """A corrupted corner shows up only in that patch's PSNR."""
    from gs_init_tpu.evaluation.patches import patch_metrics, patch_table

    gt = rng.uniform(0.2, 0.8, (48, 72, 3)).astype(np.float32)
    render = gt.copy()
    render[:12, :12] += 0.4  # corrupt top-left patch only
    m = patch_metrics(gt, np.clip(render, 0, 1), grid=(4, 6))
    assert m["psnr"].shape == (4, 6)
    assert m["psnr"][0, 0] < 15
    assert m["psnr"][1:, 1:].min() > 40
    table = patch_table(m["psnr"])
    assert "| r0 |" in table and "c5" in table


def test_analyze_renders_cli(tmp_path, rng):
    import imageio.v2 as imageio

    from gs_init_tpu.evaluation.patches import analyze_renders

    d = tmp_path / "renders"
    d.mkdir()
    gt = (rng.uniform(0, 1, (24, 36, 3)) * 255).astype(np.uint8)
    canvas = np.concatenate([gt, gt], axis=1)
    imageio.imwrite(str(d / "val_30_000.png"), canvas)
    rows = analyze_renders(str(tmp_path), grid=(2, 3))
    assert len(rows) == 1 and rows[0]["step"] == 30
    assert np.isfinite(rows[0]["psnr"]).all()
    assert rows[0]["psnr"].min() > 60  # identical halves
