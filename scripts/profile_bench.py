#!/usr/bin/env python
"""Trace the bench train step on TPU and print top HLO ops by self time.

Usage: python scripts/profile_bench.py [n_gaussians] [width] [height]
Writes the xplane trace under /tmp/gs_prof and parses it with
tensorboard_plugin_profile (framework op stats), printing a table.
"""
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(n, width, height, pair_cap=None, steps=6):
    import jax
    import jax.numpy as jnp

    from gs_init_tpu.config import Config
    from gs_init_tpu.datasets.synthetic import look_at
    from gs_init_tpu.engine.optim import init_adam_state, make_adam_config
    from gs_init_tpu.engine.params import init_from_points
    from gs_init_tpu.engine.strategy import default as dstrat
    from gs_init_tpu.engine.train_step import (
        AuxParams, Batch, init_aux_opt, make_train_step,
    )

    cap = -(-n // 65536) * 65536 + 65536
    rng = np.random.default_rng(0)
    pts = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(-1, 6, n)],
        axis=-1,
    ).astype(np.float32)
    rgbs = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cfg = Config(
        max_steps=30_000, sh_degree=3, max_gaussians=cap,
        pair_capacity=pair_cap or (1 << 21),
        tile_size=int(os.environ.get("GS_BENCH_TILE", 32)),
        chunk_size=int(os.environ.get("GS_BENCH_CHUNK", 128)),
    )
    # Same guard as bench.py: the O(N^2) init kNN exceeds the relay's
    # program watchdog past ~1M points (a 3M run crashed the TPU worker);
    # pin the equivalent constant instead (density^-1/3 scaling).
    fixed = (
        0.0609 * float((n / 300_000.0) ** (-1.0 / 3.0)) if n > 1_000_000 else None
    )
    gstate = init_from_points(
        jnp.asarray(pts), jnp.asarray(rgbs), cap, 3, fixed_scale=fixed
    )
    adam = init_adam_state(gstate.params)
    acfg = make_adam_config(cfg, scene_scale=4.0)
    sstate = dstrat.init_state(cap)
    aux = AuxParams()
    aux_opt = init_aux_opt(aux)
    step_fn = make_train_step(cfg, acfg, width, height)

    c2w = look_at(np.array([0.0, 0.0, -8.0]), np.zeros(3))
    f = 0.85 * width
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], np.float32)
    target = rng.uniform(0, 1, (1, height, width, 3)).astype(np.float32)
    batch = Batch(
        camtoworlds=jnp.asarray(c2w, jnp.float32)[None],
        Ks=jnp.asarray(K)[None],
        pixels=jnp.asarray(target),
        image_ids=jnp.zeros((1,), jnp.int32),
    )
    key = jax.random.PRNGKey(0)

    out = step_fn(gstate, adam, sstate, aux, aux_opt, batch, jnp.int32(0), key)
    gstate, adam, sstate, aux, aux_opt = out[:5]  # step donates its inputs
    loss0 = float(out[-1]["loss"])
    pairs = int(out[-1]["pairs"]) + int(out[-1]["overflow"])
    if pair_cap is None:
        snug = 1 << (max(int(pairs * 1.5), 1 << 14) - 1).bit_length()
        if snug < cfg.pair_capacity:
            cfg.pair_capacity = snug
            step_fn = make_train_step(cfg, acfg, width, height)
            out = step_fn(
                gstate, adam, sstate, aux, aux_opt, batch, jnp.int32(0), key
            )
            gstate, adam, sstate, aux, aux_opt = out[:5]
            float(out[-1]["loss"])
    print(f"warm loss={loss0:.4f} pairs={pairs} cap={cfg.pair_capacity}")

    logdir = "/tmp/gs_prof"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    t0 = time.perf_counter()
    for i in range(steps):
        gstate, adam, sstate, aux, aux_opt, metrics = step_fn(
            gstate, adam, sstate, aux, aux_opt, batch, jnp.int32(i + 1), key
        )
    loss = float(metrics["loss"])
    el = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"{steps} steps in {el*1000:.1f} ms -> {el/steps*1000:.1f} ms/step "
          f"({steps/el:.2f} steps/s), loss={loss:.4f}")
    return logdir


def parse(logdir, top=35):
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    xspaces = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    assert xspaces, f"no xplane under {logdir}"
    data, _ = rtd.xspace_to_tool_data(xspaces, "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    rows = json.loads(data) if data.lstrip().startswith("[") else None
    if rows is None:
        # gviz csv fallback
        print(data[:2000])
        return
    # rows: list of dicts? The tool returns gviz JSON; handle generically.
    print(json.dumps(rows)[:2000])


def parse_csv(logdir, top=40):
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    xspaces = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    data, _ = rtd.xspace_to_tool_data(
        xspaces, "framework_op_stats", {"tqx": "out:csv;"}
    )
    if isinstance(data, bytes):
        data = data.decode()
    lines = data.splitlines()
    import csv as _csv
    import io

    rdr = _csv.reader(io.StringIO(data))
    hdr = next(rdr)
    try:
        i_name = hdr.index("Operation")
    except ValueError:
        i_name = 2
    # find self-time column
    cand = [i for i, h in enumerate(hdr) if "self" in h.lower() and "time" in h.lower()]
    i_self = cand[0] if cand else 7
    rows = list(rdr)
    print(f"columns: {hdr}")
    rows.sort(key=lambda r: -float(r[i_self] or 0))
    tot = sum(float(r[i_self] or 0) for r in rows)
    print(f"total self time: {tot/1e6:.1f} ms (all steps)")
    for r in rows[:top]:
        print(f"{float(r[i_self] or 0)/1e6:9.3f} ms  {r[i_name][:110]}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1296
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 840
    pc = int(sys.argv[4]) if len(sys.argv) > 4 else None
    logdir = run(n, w, h, pair_cap=pc)
    try:
        parse_csv(logdir)
    except Exception as e:
        print("csv parse failed:", e)
        parse(logdir)
