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
    # Stale stamp -> backed up into <root>_backup with a timestamp suffix,
    # preserving the scene-relative path (reference evaluator :53-76).
    json.dump({"run_id": "stale"}, open(os.path.join(r0.out_dir, "run_id.json"), "w"))
    runs3 = plan_sweep("/data", ["garden", "room"], ["{default,mcmc}"], root)
    assert sum(r.done for r in runs3) == 0
    assert not os.path.exists(r0.out_dir)
    backup_root = root + "_backup"
    rel_parent = os.path.relpath(os.path.dirname(r0.out_dir), root)
    backups = os.listdir(os.path.join(backup_root, rel_parent))
    assert len(backups) == 1
    assert backups[0].startswith(os.path.basename(r0.out_dir) + "_")
    # The backed-up tree still contains the stale stamp.
    assert os.path.exists(
        os.path.join(backup_root, rel_parent, backups[0], "run_id.json")
    )


def test_force_overwrite_backs_up_completed_run(tmp_path):
    root = str(tmp_path / "out")
    runs = plan_sweep("/data", ["garden"], ["default"], root)
    r0 = runs[0]
    os.makedirs(os.path.join(r0.out_dir, "stats"), exist_ok=True)
    json.dump({"run_id": r0.run_id}, open(os.path.join(r0.out_dir, "run_id.json"), "w"))
    json.dump({}, open(os.path.join(r0.out_dir, "stats", "train_final.json"), "w"))
    runs2 = plan_sweep("/data", ["garden"], ["default"], root, force_overwrite=True)
    assert not runs2[0].done
    assert not os.path.exists(r0.out_dir)


def test_done_requires_per_step_val_stats(tmp_path):
    """A run whose cfg.json lists eval steps is incomplete until every
    val_step{S}.json exists (reference output_dir_needs_overwrite)."""
    root = str(tmp_path / "out")
    runs = plan_sweep("/data", ["garden"], ["default"], root)
    r0 = runs[0]
    os.makedirs(os.path.join(r0.out_dir, "stats"), exist_ok=True)
    json.dump({"run_id": r0.run_id}, open(os.path.join(r0.out_dir, "run_id.json"), "w"))
    json.dump({}, open(os.path.join(r0.out_dir, "stats", "train_final.json"), "w"))
    json.dump({"eval_steps": [5, 10]}, open(os.path.join(r0.out_dir, "cfg.json"), "w"))
    json.dump({}, open(os.path.join(r0.out_dir, "stats", "val_step5.json"), "w"))
    runs2 = plan_sweep("/data", ["garden"], ["default"], root)
    assert not runs2[0].done  # val_step10.json missing -> backed up
    # Complete it and re-plan (out_dir was backed up; recreate fully).
    os.makedirs(os.path.join(r0.out_dir, "stats"), exist_ok=True)
    json.dump({"run_id": r0.run_id}, open(os.path.join(r0.out_dir, "run_id.json"), "w"))
    json.dump({}, open(os.path.join(r0.out_dir, "stats", "train_final.json"), "w"))
    json.dump({"eval_steps": [5, 10]}, open(os.path.join(r0.out_dir, "cfg.json"), "w"))
    json.dump({}, open(os.path.join(r0.out_dir, "stats", "val_step5.json"), "w"))
    json.dump({}, open(os.path.join(r0.out_dir, "stats", "val_step10.json"), "w"))
    runs3 = plan_sweep("/data", ["garden"], ["default"], root)
    assert runs3[0].done


def test_evaluate_run_recomputes_from_saved_renders(tmp_path, rng):
    """The separate eval pass recomputes metrics from disk and they match
    the degradation ordering (identical render -> inf/1.0, noisy -> lower)."""
    import imageio.v2 as imageio

    from gs_init_tpu.evaluation.sweep import evaluate_run

    out = tmp_path / "run"
    (out / "renders").mkdir(parents=True)
    json.dump({"eval_steps": [10]}, open(out / "cfg.json", "w"))
    gt = rng.uniform(0.2, 0.8, (32, 40, 3)).astype(np.float32)
    clean = np.clip(gt + rng.normal(0, 0.01, gt.shape), 0, 1)
    noisy = np.clip(gt + rng.normal(0, 0.2, gt.shape), 0, 1)
    for i, render in enumerate([clean, noisy]):
        canvas = (np.concatenate([gt, render], axis=1) * 255).astype(np.uint8)
        imageio.imwrite(str(out / "renders" / f"val_10_{i:03d}.png"), canvas)
    metrics = evaluate_run(str(out))
    results = json.load(open(out / "results-10.json"))
    assert results["n_images"] == 2
    per = results["per_image"]
    assert per[0]["psnr"] > per[1]["psnr"] > 5.0
    assert per[0]["ssim"] > per[1]["ssim"]
    assert metrics["psnr"] == pytest.approx(
        np.mean([p["psnr"] for p in per]), abs=1e-6
    )
    # Missing renders for an explicit step -> clear error.
    with pytest.raises(FileNotFoundError):
        evaluate_run(str(out), step=99)


def test_prune_run_keeps_last_ckpt_and_edge_steps(tmp_path):
    from gs_init_tpu.evaluation.sweep import prune_run

    out = tmp_path / "run"
    (out / "ckpts").mkdir(parents=True)
    (out / "renders").mkdir()
    for s in [5, 10, 20]:
        (out / "ckpts" / f"ckpt_{s}.npz").write_bytes(b"x")
        for i in range(2):
            (out / "renders" / f"val_{s}_{i:03d}.png").write_bytes(b"x")
    (out / "renders" / "traj_20.mp4").write_bytes(b"x")
    prune_run(str(out))
    assert sorted(os.listdir(out / "ckpts")) == ["ckpt_20.npz"]
    kept = sorted(os.listdir(out / "renders"))
    assert "val_5_000.png" in kept and "val_20_000.png" in kept
    assert not any(k.startswith("val_10_") for k in kept)
    assert "traj_20.mp4" in kept  # non-val artifacts untouched


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


def test_tb_scalar_readback_into_tables(tmp_path):
    """Train-time TB scalars are merged into table rows (reference
    nerfbaselines_evaluator.py:491-511 + parameters.py:10-30)."""
    from tensorboardX import SummaryWriter

    from gs_init_tpu.evaluation.sweep import run_id_of
    from gs_init_tpu.evaluation.tables import collect_results, read_tb_scalars

    rid = run_id_of("garden", (("__preset__", "default"),))
    run_dir = tmp_path / "out" / "garden" / f"default_{rid}"
    (run_dir / "stats").mkdir(parents=True)
    json.dump(
        {"psnr": 25.0, "ssim": 0.8},
        open(run_dir / "stats" / "val_step10.json", "w"),
    )
    w = SummaryWriter(str(run_dir / "tb"))
    for step, (ngs, loss) in enumerate([(100, 0.5), (200, 0.3), (350, 0.2)]):
        w.add_scalar("train/num_GS", ngs, step)
        w.add_scalar("train/loss", loss, step)
    w.close()

    # Last-step semantics by default; exact-step when requested.
    scalars = read_tb_scalars(str(run_dir))
    assert scalars["train/num_GS"] == 350.0
    assert scalars["train/loss"] == pytest.approx(0.2)
    at1 = read_tb_scalars(str(run_dir), ["train/num_GS"], step=1)
    assert at1["train/num_GS"] == 200.0
    # Missing tag -> absent, not an error.
    assert "train/nope" not in read_tb_scalars(str(run_dir), ["train/nope"])

    rows = collect_results(str(tmp_path / "out"))
    assert len(rows) == 1
    assert rows[0]["tb_train/num_GS"] == 350.0
    assert rows[0]["psnr"] == 25.0
    # A run with no tb dir still collects (no tb_ columns).
    rows_no_tb = collect_results(str(tmp_path / "out"), tb_tags=None)
    assert "tb_train/num_GS" not in rows_no_tb[0]
