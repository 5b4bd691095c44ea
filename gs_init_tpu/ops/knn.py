"""Brute-force k-nearest-neighbors, chunked for memory.

TPU-native replacement for the reference's sklearn NearestNeighbors usage
(utils/runner_utils.py:142-146 scale init; interp.py:176-184 and
postprocess.py:20 LOF). Distances are computed as a matmul
(|x|^2 + |y|^2 - 2 x.y) so the MXU does the heavy lifting; top-k via
jax.lax.top_k over chunks of queries.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn(
    queries: jnp.ndarray,  # [M, D]
    points: jnp.ndarray,  # [N, D]
    k: int = 4,
    chunk: int = 2048,
):
    """Return (dists [M, k], idx [M, k]) of the k nearest points per query.

    Note: if ``queries is points``, the nearest neighbor is the point itself
    (distance 0) — pass k+1 and drop column 0 for strict neighbors.
    """
    m = queries.shape[0]
    pad = (-m) % chunk
    q = jnp.concatenate([queries, jnp.zeros((pad, queries.shape[1]), queries.dtype)])
    q = q.reshape(-1, chunk, queries.shape[1])
    p_sq = jnp.sum(points * points, axis=-1)

    def body(qc):
        d2 = (
            jnp.sum(qc * qc, axis=-1, keepdims=True)
            - 2.0 * qc @ points.T
            + p_sq[None, :]
        )
        neg, idx = jax.lax.top_k(-d2, k)
        return jnp.maximum(-neg, 0.0), idx

    d2, idx = jax.lax.map(body, q)
    d2 = d2.reshape(-1, k)[:m]
    idx = idx.reshape(-1, k)[:m]
    return jnp.sqrt(d2), idx


def mean_knn_dist(points: jnp.ndarray, k: int = 3, chunk: int = 2048) -> jnp.ndarray:
    """Average distance to the k nearest strict neighbors, per point [N].

    Matches the reference's scale initialization (runner.py:87-91): average
    of squared distances to 3 neighbors -> sqrt.
    """
    d, _ = knn(points, points, k=k + 1, chunk=chunk)
    d2 = d[:, 1:] ** 2
    return jnp.sqrt(jnp.mean(d2, axis=-1))
