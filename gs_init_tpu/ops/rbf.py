"""Thin-plate-spline RBF interpolation — replacement for torchrbf
(reference interp.py:24,45-51): dense masked solve + grid evaluation, all
MXU matmuls.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _tps_kernel(r2: jnp.ndarray) -> jnp.ndarray:
    # phi(r) = r^2 log(r) = 0.5 r^2 log(r^2); define phi(0) = 0.
    return 0.5 * r2 * jnp.log(jnp.maximum(r2, 1e-20))


@functools.partial(jax.jit, static_argnames=("smoothing",))
def tps_fit(
    centers: jnp.ndarray,  # [M, 2] (padded)
    values: jnp.ndarray,  # [M]
    valid: jnp.ndarray,  # [M] bool
    smoothing: float = 0.0,
):
    """Fit a 2-D thin-plate spline with affine polynomial part.

    Padded (invalid) centers receive identity rows so the dense solve stays
    well-posed and their weights come out exactly zero.
    """
    m = centers.shape[0]
    v = valid.astype(jnp.float32)
    d = centers[:, None, :] - centers[None, :, :]
    r2 = jnp.sum(d * d, axis=-1)
    K = _tps_kernel(r2) + smoothing * jnp.eye(m)
    K = K * v[:, None] * v[None, :] + (1.0 - v)[:, None] * jnp.eye(m)
    P = jnp.concatenate([jnp.ones((m, 1)), centers], axis=1) * v[:, None]
    A = jnp.block(
        [[K, P], [P.T, jnp.zeros((3, 3))]]
    )
    # Regularize the polynomial block slightly for degenerate layouts.
    A = A + 1e-8 * jnp.eye(m + 3)
    rhs = jnp.concatenate([values * v, jnp.zeros((3,))])
    sol = jnp.linalg.solve(A, rhs)
    return sol[:m], sol[m:]  # weights, poly coeffs (1, x, y)


def tps_eval(
    centers: jnp.ndarray,  # [M, 2]
    weights: jnp.ndarray,  # [M]
    poly: jnp.ndarray,  # [3]
    queries: jnp.ndarray,  # [Q, 2]
) -> jnp.ndarray:
    d = queries[:, None, :] - centers[None, :, :]
    r2 = jnp.sum(d * d, axis=-1)
    return (
        _tps_kernel(r2) @ weights
        + poly[0]
        + queries @ poly[1:]
    )


def tps_interpolate_grid(
    centers: jnp.ndarray,
    values: jnp.ndarray,
    valid: jnp.ndarray,
    height: int,
    width: int,
    grid_width: int = 256,
    smoothing: float = 1e-6,
) -> jnp.ndarray:
    """Dense [H, W] map: TPS evaluated on a coarse grid (<= grid_width wide,
    the reference's downsample trick, interp.py:30-72) then bilinearly
    upsampled."""
    w, p = tps_fit(centers, values, valid, smoothing=smoothing)
    gw = min(grid_width, width)
    gh = max(int(round(height * gw / width)), 1)
    xs = (jnp.arange(gw) + 0.5) * (width / gw)
    ys = (jnp.arange(gh) + 0.5) * (height / gh)
    q = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1).reshape(-1, 2)
    coarse = tps_eval(centers, w, p, q).reshape(gh, gw)
    return jax.image.resize(coarse, (height, width), method="bilinear")
