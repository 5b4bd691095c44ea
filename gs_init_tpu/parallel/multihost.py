"""Multi-host (DCN) initialization + global mesh construction.

TPU-native replacement for the reference's process-per-GPU NCCL launcher
(gsplat.distributed.cli at trainer.py:58): JAX is single-controller per
host — one process per host calls ``jax.distributed.initialize`` and every
jitted computation then spans all hosts' devices via GSPMD.

Axis layout policy (SURVEY.md §5.8): the "data" (camera) axis is laid out
ACROSS hosts — its collectives are the small loss/gradient psums that can
ride DCN — while the "gauss" axis stays WITHIN a host so the per-step
all_gather of screen-space attributes rides ICI.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize the JAX distributed runtime (idempotent).

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); on TPU pods all three are normally
    auto-detected from the TPU metadata and may be omitted entirely.
    Returns (process_index, process_count).
    """
    from jax._src import distributed as _dist

    already = getattr(_dist.global_state, "client", None) is not None
    if not already and (
        coordinator_address
        or num_processes
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
    ):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def make_global_mesh(
    n_data: Optional[int] = None, n_gauss: Optional[int] = None
) -> Mesh:
    """Mesh over ALL processes' devices, data axis spanning hosts.

    Defaults: n_data = process_count (one data shard per host, batch
    parallel over DCN), n_gauss = local device count (gaussian shards over
    ICI). ``jax.devices()`` is globally consistent across processes, so the
    same mesh is constructed everywhere.
    """
    n_hosts = jax.process_count()
    n_local = jax.local_device_count()
    n_data = n_data or n_hosts
    n_gauss = n_gauss or (n_hosts * n_local) // max(n_data, 1)
    devices = np.asarray(jax.devices())
    assert devices.size >= n_data * n_gauss, (
        f"need {n_data * n_gauss} devices, have {devices.size}"
    )
    # jax.devices() orders by process then local id; reshaping (data, gauss)
    # row-major therefore keeps each gauss row within as few hosts as
    # possible (exactly one when n_gauss == local device count).
    return Mesh(
        devices[: n_data * n_gauss].reshape(n_data, n_gauss),
        ("data", "gauss"),
    )


def local_batch_slice(global_batch: int) -> slice:
    """This process's slice of a data-axis-sharded global batch."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
