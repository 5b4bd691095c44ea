"""Gaussian parameter buffers — fixed capacity, mask-based liveness.

The reference mutates torch ParameterDicts in place when densifying
(gsplat strategies). Under XLA, dynamic shapes would force recompilation on
every grow/prune, so gaussians live in static [CAP, ...] buffers with an
``alive`` mask; densification (engine/strategy/) moves data between slots
and flips mask bits without changing shapes. Dead slots are culled in
projection (``alive`` mask -> radius 0) and receive zero gradients.

Mirrors create_splats_with_optimizers (reference runner.py:53-138): kNN
scale init, logit opacities, SH color layout [sh0 | shN].
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.knn import mean_knn_dist
from ..ops.sh import num_sh_bases

SH0_C = 0.28209479177387814


class GaussianParams(NamedTuple):
    """Trainable gaussian buffers. All leading dims = capacity CAP."""

    means: jnp.ndarray  # [CAP, 3]
    quats: jnp.ndarray  # [CAP, 4] (normalized in projection)
    scales: jnp.ndarray  # [CAP, 3] log-scale
    opacities: jnp.ndarray  # [CAP] logit
    sh0: jnp.ndarray  # [CAP, 1, 3]
    shN: jnp.ndarray  # [CAP, K-1, 3]

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    def sh_coeffs(self) -> jnp.ndarray:
        return jnp.concatenate([self.sh0, self.shN], axis=1)

    def activated(self):
        """(scales, opacities) after activation."""
        return jnp.exp(self.scales), jax.nn.sigmoid(self.opacities)


class GaussianState(NamedTuple):
    """Params + liveness (alive is not a trainable leaf)."""

    params: GaussianParams
    alive: jnp.ndarray  # [CAP] bool


def rgb_to_sh0(rgb: jnp.ndarray) -> jnp.ndarray:
    return (rgb - 0.5) / SH0_C


def sh0_to_rgb(sh0: jnp.ndarray) -> jnp.ndarray:
    return sh0 * SH0_C + 0.5


def init_from_points(
    points: jnp.ndarray,  # [N, 3]
    rgbs: jnp.ndarray,  # [N, 3] in [0, 1]
    capacity: int,
    sh_degree: int = 3,
    init_opacity: float = 0.1,
    init_scale: float = 1.0,
    rng: Optional[jax.Array] = None,
    scale_clamp_quantile: float = 0.0,
    fixed_scale: Optional[float] = None,
) -> GaussianState:
    """SfM / monocular-depth point-cloud initialization.

    Scale init = log(mean kNN distance * init_scale) as in reference
    runner.py:87-91; when N exceeds capacity a UNIFORM random subset is
    kept — the point cloud is image-ordered (mdi/init.py accumulates per
    image), so head-truncation would keep only the first few images' points
    and discard whole views. When scale_clamp_quantile > 0, kNN distances
    are clamped to that quantile before the log (reference
    limit_init_scale, monocular_depth_init.py:215-224) so a few isolated
    points can't spawn huge gaussians.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    n = min(points.shape[0], capacity)
    if points.shape[0] > capacity:
        sel_key, rng = jax.random.split(rng)
        sel = jax.random.choice(
            sel_key, points.shape[0], (capacity,), replace=False
        )
        points = points[sel]
        rgbs = rgbs[sel]
    else:
        points = points[:n]
        rgbs = rgbs[:n]
    if fixed_scale is not None:
        # Benchmark/bring-up path: skip the O(N^2) kNN (init-time only;
        # multi-million-gaussian states normally arise from densification,
        # which never re-runs scale init).
        dist = jnp.full((n,), fixed_scale, jnp.float32)
    else:
        dist = jnp.clip(mean_knn_dist(points, k=3), 1e-7, None)
    if scale_clamp_quantile > 0.0:
        q = jnp.quantile(dist, scale_clamp_quantile)
        dist = jnp.minimum(dist, q)
    scales = jnp.log(dist * init_scale)[:, None].repeat(3, axis=1)

    k = num_sh_bases(sh_degree)
    quats = jax.random.normal(rng, (capacity, 4), jnp.float32)
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)

    def place(buf, vals):
        return buf.at[:n].set(vals)

    params = GaussianParams(
        means=place(jnp.zeros((capacity, 3), jnp.float32), points),
        quats=quats,
        scales=place(jnp.full((capacity, 3), -10.0, jnp.float32), scales),
        opacities=jnp.full(
            (capacity,), _logit(init_opacity), jnp.float32
        ),
        sh0=place(
            jnp.zeros((capacity, 1, 3), jnp.float32), rgb_to_sh0(rgbs)[:, None, :]
        ),
        shN=jnp.zeros((capacity, k - 1, 3), jnp.float32),
    )
    alive = jnp.arange(capacity) < n
    return GaussianState(params=params, alive=alive)


def init_random(
    rng: jax.Array,
    num_points: int,
    capacity: int,
    extent: float = 3.0,
    scene_scale: float = 1.0,
    sh_degree: int = 3,
    init_opacity: float = 0.1,
    init_scale: float = 1.0,
) -> GaussianState:
    """Random-in-box init (reference init_type="random", runner.py:80-84)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    pts = (
        (jax.random.uniform(k1, (num_points, 3)) * 2.0 - 1.0)
        * extent
        * scene_scale
    )
    rgbs = jax.random.uniform(k2, (num_points, 3))
    return init_from_points(
        pts, rgbs, capacity, sh_degree, init_opacity, init_scale, rng=k3
    )


def _logit(p: float) -> float:
    import math

    return math.log(p / (1.0 - p))


def num_alive(state: GaussianState) -> jnp.ndarray:
    return jnp.sum(state.alive.astype(jnp.int32))
