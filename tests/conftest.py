"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's test plan: multi-device tests run on CPU via
XLA_FLAGS=--xla_force_host_platform_device_count=8 so sharding logic is
exercised without TPU hardware. Pallas kernels auto-select interpret mode
on CPU (see gs_init_tpu.ops.rasterize).

The environment registers a TPU PJRT plugin at interpreter startup
(sitecustomize), which locks the platform before this file runs — so if the
backend is already pinned to a non-CPU platform we re-exec pytest once with
the corrected environment.
"""
import os
import sys

_WANT = {
    "JAX_PLATFORMS": "cpu",
    "PALLAS_AXON_POOL_IPS": "",  # disables TPU plugin registration at boot
}


def _needs_reexec() -> bool:
    if os.environ.get("_GS_TPU_TEST_REEXEC") == "1":
        return False
    if any(os.environ.get(k, "") != v for k, v in _WANT.items()):
        return True
    return "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""
    )


if _needs_reexec():
    env = dict(os.environ)
    env.update(_WANT)
    env["_GS_TPU_TEST_REEXEC"] = "1"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(
        sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env
    )

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------- test tiers
# `pytest -m core` = fast tier (<~3 min): pure-math / IO / small-scene tests.
# `pytest -m heavy` = slow tier: mesh-parity, model-parity, Pallas oracle and
# full-runner tests (the whole suite is ~15 min on CPU). See README.

_HEAVY_MODULES = {
    "test_parallel",
    "test_depth_predictor",
    "test_runner",
    "test_train_smoke",
    "test_appearance",
    "test_rasterize_pallas",
    "test_mdi",
    "test_dav2_hf_parity",
    "test_dino_registers_parity",
    "test_metric3d_parity",
    "test_depth_pro_parity",
    "test_ckpt_orbax",
    # full-runner / mesh-parity e2e tests (each 20-40 s: jit a whole train
    # step, often per mesh shape) — the fast tier must stay <5 min
    "test_band_shard",
    "test_runner_mesh",
    "test_integration",
    "test_masks_export",
    "test_viewer_live",
}


def pytest_configure(config):
    config.addinivalue_line("markers", "core: fast test tier (<~3 min total)")
    config.addinivalue_line("markers", "heavy: slow parity/mesh/model tests")


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = os.path.splitext(os.path.basename(str(item.fspath)))[0]
        tier = "heavy" if name in _HEAVY_MODULES else "core"
        item.add_marker(getattr(pytest.mark, tier))
