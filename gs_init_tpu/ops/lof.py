"""Local Outlier Factor — JAX/TPU replacement for sklearn's LOF usage in the
reference (point_cloud_postprocess/postprocess.py:16-30 with k=40;
interp.py:161-201 scale-outlier removal).

Brute-force kNN (MXU matmul distances) + the standard LOF definition:
  k-dist(o)        = distance to o's k-th neighbor
  reach_k(p, o)    = max(k-dist(o), d(p, o))
  lrd(p)           = 1 / mean_o reach_k(p, o)
  LOF(p)           = mean_o lrd(o) / lrd(p)
Scores ~1 are inliers; > threshold (sklearn default contamination logic is
replaced by an explicit threshold) are outliers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .knn import knn


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def lof_scores(points: jnp.ndarray, k: int = 40, chunk: int = 2048) -> jnp.ndarray:
    """LOF score per point, [N]."""
    d, idx = knn(points, points, k=k + 1, chunk=chunk)
    d, idx = d[:, 1:], idx[:, 1:]  # strict neighbors
    kdist = d[:, -1]  # distance to k-th neighbor
    reach = jnp.maximum(kdist[idx], d)  # [N, k]
    lrd = 1.0 / jnp.maximum(jnp.mean(reach, axis=1), 1e-12)
    return jnp.mean(lrd[idx], axis=1) / lrd


def lof_inlier_mask(
    points: jnp.ndarray, k: int = 40, threshold: float = 1.5, chunk: int = 2048
) -> jnp.ndarray:
    return lof_scores(points, k=k, chunk=chunk) <= threshold
