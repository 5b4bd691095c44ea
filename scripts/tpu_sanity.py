#!/usr/bin/env python
"""On-chip sanity: Pallas compositor vs XLA oracle, fwd + bwd, real TPU.

Small scene (80x64, 64 gaussians) so each program runs in milliseconds —
safe for the relay watchdog. Prints normalized max-abs gradient diffs per
parameter; expect bf16-grade (~3e-3) agreement. Flags exercise the perf
variants (reorder_table / sort_bf16 / chunk 256) in one process.

Usage: python scripts/tpu_sanity.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gs_init_tpu.ops.render import rasterize

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    W, H, n = 80, 64, 64
    K = jnp.array([[70.0, 0, W / 2], [0, 70.0, H / 2], [0, 0, 1]], jnp.float32)
    vm = jnp.eye(4, dtype=jnp.float32)[None]
    means = jnp.asarray(
        np.stack(
            [rng.uniform(-0.7, 0.7, n), rng.uniform(-0.5, 0.5, n),
             rng.uniform(1, 4, n)], -1
        ), jnp.float32,
    )
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    scales = jnp.asarray(rng.uniform(0.02, 0.2, (n, 3)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.95, n), jnp.float32)
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    target = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)
    params = (means, quats, scales, opac, colors)

    def loss(impl, p, **kw):
        r, a, _ = rasterize(
            *p, vm, K[None], W, H, impl=impl, pair_capacity=8192, **kw
        )
        return jnp.mean((r - target) ** 2) + 0.1 * jnp.mean(a)

    t0 = time.time()
    l_ref, g_ref = jax.value_and_grad(lambda p: loss("xla", p))(params)
    l_ref = float(l_ref)
    print(f"oracle loss {l_ref:.6f}  ({time.time()-t0:.0f}s)", flush=True)

    names = ["means", "quats", "scales", "opac", "colors"]
    variants = [
        ("pallas", {}),
        ("pallas+reorder", {"reorder_table": True}),
        ("pallas+bf16sort", {"sort_bf16": True}),
        ("pallas+chunk256", {"chunk_size": 256}),
    ]
    ok = True
    for label, kw in variants:
        t0 = time.time()
        l, g = jax.value_and_grad(lambda p: loss("pallas", p, **kw))(params)
        l = float(l)
        diffs = []
        for nm, a, b in zip(names, g_ref, g):
            a, b = np.asarray(a), np.asarray(jax.device_get(b))
            if not np.isfinite(b).all():
                print(f"  {label}: NON-FINITE grad in {nm}", flush=True)
                ok = False
                continue
            s = np.abs(a).max() + 1e-8
            diffs.append((nm, float(np.abs(b - a).max() / s)))
        # All-non-finite grads leave diffs empty; inf keeps the FAIL path
        # alive instead of max() raising on an empty sequence.
        worst = max([d for _, d in diffs] or [float("inf")])
        tol = 2e-2 if "bf16" in label else 5e-3
        status = "OK" if abs(l - l_ref) < 1e-4 * (1 + abs(l_ref)) and worst < tol else "FAIL"
        if status == "FAIL":
            ok = False
        print(
            f"  {label}: loss {l:.6f} worst-grad-rel {worst:.2e} "
            f"[{status}] ({time.time()-t0:.0f}s) "
            + " ".join(f"{nm}={d:.1e}" for nm, d in diffs),
            flush=True,
        )
    from gs_init_tpu.ops import rasterize as _rz

    print(
        f"scan lowering used: {_rz._scan_mode()}"
        + (" (env override)" if os.environ.get("GS_SCAN") else " (probed)"),
        flush=True,
    )
    print("SANITY", "PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
