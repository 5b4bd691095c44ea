"""Bounded TPU-relay health probe, shared by bench.py / __graft_entry__.py.

While the axon relay is down, ``import jax`` retry-sleeps indefinitely
inside the TPU plugin — even under ``JAX_PLATFORMS=cpu`` — unless
``PALLAS_AXON_POOL_IPS=""`` skips plugin registration (PERF.md). Every
process that might import jax against the relay must therefore probe first
with a bounded FRESH interpreter. The result is cached in /tmp so sibling
processes (bench re-execs, the dryrun child, the watcher) share one probe.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

CACHE_PATH = "/tmp/gs_relay_probe.json"
PROBE = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((128, 128), jnp.bfloat16);"
    "print('TPU_OK', float((x @ x).sum()))"
)


def probe_relay(timeout: float = 150.0, cache_ttl: float = 90.0) -> bool:
    """Return True iff a fresh interpreter can run a matmul on the relay."""
    try:
        with open(CACHE_PATH) as f:
            rec = json.load(f)
        if time.time() - rec["ts"] < cache_ttl:
            return bool(rec["ok"])
    except (OSError, KeyError, ValueError):
        pass
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # probe must try the real plugin
    env.pop("JAX_PLATFORMS", None)  # sitecustomize re-pins axon in the child
    try:
        r = subprocess.run(
            [sys.executable, "-c", PROBE],
            capture_output=True, timeout=timeout, text=True, env=env,
        )
        ok = "TPU_OK" in r.stdout
    except (subprocess.TimeoutExpired, OSError):
        ok = False
    try:
        with open(CACHE_PATH, "w") as f:
            json.dump({"ok": ok, "ts": time.time()}, f)
    except OSError:
        pass
    return ok


def ensure_safe_jax_env(timeout: float = 150.0) -> bool:
    """Make ``import jax`` in this process hang-proof; return relay health.

    On probe failure, disables the axon plugin and pins ``JAX_PLATFORMS=cpu``
    (sitecustomize forces axon otherwise) so any later jax import in the
    calling process — ours or the driver's — stays green.
    """
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return False  # explicit CPU run: no relay involved
    if "PALLAS_AXON_POOL_IPS" in os.environ:
        return False  # plugin already disabled by caller
    ok = probe_relay(timeout=timeout)
    if not ok:
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        os.environ["JAX_PLATFORMS"] = "cpu"
        print(
            "[relay] tpu relay unreachable (bounded probe); disabled axon "
            "plugin, falling back to CPU",
            file=sys.stderr,
        )
    return ok
