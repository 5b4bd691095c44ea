"""Device memory statistics — the reference's CUDA memory tracker equivalent
(utils/cuda_memory.py:18-54), reading JAX device memory stats instead."""
from __future__ import annotations

import logging

import jax

_LOGGER = logging.getLogger(__name__)


def device_memory_stats(device=None) -> dict:
    """bytes_in_use / peak / limit for a device (empty dict if unsupported)."""
    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except (AttributeError, NotImplementedError):
        return {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
    }


def format_memory_stats(device=None) -> str:
    s = device_memory_stats(device)
    if not s:
        return "device memory stats unavailable"
    gb = 1024**3
    return (
        f"in_use {s['bytes_in_use'] / gb:.2f}GB / "
        f"peak {s['peak_bytes_in_use'] / gb:.2f}GB / "
        f"limit {s['bytes_limit'] / gb:.2f}GB"
    )


def log_memory(tag: str = "", device=None) -> None:
    _LOGGER.info("[mem]%s %s", f" {tag}" if tag else "", format_memory_stats(device))
