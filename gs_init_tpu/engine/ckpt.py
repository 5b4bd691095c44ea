"""Checkpointing backends.

Two formats:
- "npz" (default): single-file full-state checkpoint (engine/runner.py) —
  simple, portable, exact mid-training resume.
- "orbax": sharded device-aware checkpointing for multi-chip training —
  the TPU-native replacement for the reference's per-rank ``ckpt_*_rank{r}``
  files + concat-on-load (trainer.py:24-29, SURVEY §5.8). Arrays keep their
  NamedShardings; restore re-shards onto the current mesh.
"""
from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np


def _state_tree(runner) -> Dict[str, Any]:
    return dict(
        params=runner.gstate.params._asdict(),
        alive=runner.gstate.alive,
        adam=dict(
            mu=runner.adam.mu._asdict(),
            nu=runner.adam.nu._asdict(),
            count=runner.adam.count,
        ),
        strategy=runner.sstate._asdict(),
    )


def save_orbax(runner, step: int) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(
        os.path.join(runner.cfg.result_dir, "ckpts", f"orbax_{step}")
    )
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _state_tree(runner), force=True)
    return path


def load_orbax(runner, path: str) -> None:
    import orbax.checkpoint as ocp

    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=getattr(x, "sharding", None)
        ),
        _state_tree(runner),
    )
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.abspath(path), abstract)
    p = runner.gstate.params
    runner.gstate = runner.gstate._replace(
        params=type(p)(**state["params"]), alive=state["alive"]
    )
    runner.adam = runner.adam._replace(
        mu=type(p)(**state["adam"]["mu"]),
        nu=type(p)(**state["adam"]["nu"]),
        count=state["adam"]["count"],
    )
    runner.sstate = type(runner.sstate)(**state["strategy"])
