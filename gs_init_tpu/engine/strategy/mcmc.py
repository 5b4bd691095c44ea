"""MCMC densification strategy — relocation + stochastic position noise.

TPU-native re-design of gsplat's MCMCStrategy (reference config
trainer.py:84-91, per-scene caps nerfbaselines_evaluator.py:514-524),
implementing the 3DGS-as-MCMC formulation (Kheradmand et al., arXiv
2404.09591): dead (near-transparent) gaussians are relocated to samples of
live ones drawn with probability proportional to opacity, with the paper's
opacity/scale corrections (eq. 9) so the rendered distribution is preserved;
every step a covariance-shaped noise term scaled by the means learning rate
perturbs near-transparent gaussians.

Capacity-buffer formulation: relocation destinations are dead slots plus a
5%-growth tranche of free slots (bounded by cfg.cap_max and the static
buffer size); all shapes static, no recompilation.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from ...config import MCMCStrategyConfig
from ..optim import AdamState
from ..params import GaussianState
from ...ops.projection import quat_to_rotmat

_N_MAX = 51  # matches the binomial table bound used by 3DGS-MCMC


def _log_binom(n, i):
    return gammaln(n + 1.0) - gammaln(i + 1.0) - gammaln(n - i + 1.0)


def relocation_params(opacity: jnp.ndarray, n: jnp.ndarray):
    """New (opacity, scale factor) when a gaussian is split into n samples.

    opacity: [K] current opacities (post-sigmoid); n: [K] sample counts >= 1.
    Returns (new_opacity [K], scale_factor [K]) with eq. 9 of 3DGS-MCMC.
    """
    n = jnp.clip(n.astype(jnp.float32), 1.0, _N_MAX)
    new_o = 1.0 - jnp.power(1.0 - opacity, 1.0 / n)
    i = jnp.arange(1, _N_MAX + 1, dtype=jnp.float32)  # [I]
    sign = jnp.where(i % 2 == 1, 1.0, -1.0)
    log_terms = _log_binom(n[:, None], i[None, :]) + i[None, :] * jnp.log(
        jnp.maximum(new_o[:, None], 1e-12)
    )
    terms = sign[None, :] / jnp.sqrt(i)[None, :] * jnp.exp(log_terms)
    terms = jnp.where(i[None, :] <= n[:, None], terms, 0.0)
    denom = jnp.sum(terms, axis=1)
    factor = opacity / jnp.maximum(denom, 1e-12)
    return new_o, factor


def refine(
    gstate: GaussianState,
    adam: AdamState,
    sstate,
    key: jax.Array,
    cfg: MCMCStrategyConfig,
):
    """Relocate dead gaussians + add new ones (5% growth up to cap_max)."""
    params, alive = gstate.params, gstate.alive
    cap = alive.shape[0]
    opa = jax.nn.sigmoid(params.opacities)

    dead = alive & (opa < cfg.min_opacity)
    live = alive & ~dead

    # Growth tranche: +5% of current count, bounded by cap_max and capacity.
    n_alive = jnp.sum(alive.astype(jnp.int32))
    target = jnp.minimum(
        jnp.int32(min(cfg.cap_max, cap)),
        (n_alive.astype(jnp.float32) * 1.05).astype(jnp.int32),
    )
    free = ~alive
    add_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    add_mask = free & (add_rank < jnp.maximum(target - n_alive, 0))

    recv = dead | add_mask
    logits = jnp.where(live, jnp.log(jnp.maximum(opa, 1e-12)), -jnp.inf)
    k1, k2 = jax.random.split(key)
    targets = jax.random.categorical(k1, logits, shape=(cap,))
    targets = jnp.where(recv, targets, cap)  # sentinel for non-receivers
    extra = jnp.zeros((cap,), jnp.int32).at[targets].add(1, mode="drop")
    n_split = 1.0 + extra.astype(jnp.float32)

    new_o, factor = relocation_params(opa, n_split)
    touched = (extra > 0) & live
    new_opacities = jnp.where(
        touched,
        jnp.log(jnp.maximum(new_o, 1e-9) / jnp.maximum(1.0 - new_o, 1e-9)),
        params.opacities,
    )
    new_scales = jnp.where(
        touched[:, None], params.scales + jnp.log(jnp.maximum(factor, 1e-12))[:, None],
        params.scales,
    )
    updated = params._replace(opacities=new_opacities, scales=new_scales)

    # Copy target attributes into receiver slots.
    t = jnp.clip(targets, 0, cap - 1)

    def copy(leaf):
        src = leaf[t]
        mask = recv.reshape((cap,) + (1,) * (leaf.ndim - 1))
        return jnp.where(mask, src, leaf)

    params = jax.tree.map(copy, updated)
    alive = alive | add_mask

    # Reset Adam moments of every touched slot (receivers + split targets).
    zero = recv | touched

    def zero_slots(m):
        mask = zero.reshape((cap,) + (1,) * (m.ndim - 1))
        return jnp.where(mask, 0.0, m)

    adam = adam._replace(
        mu=jax.tree.map(zero_slots, adam.mu),
        nu=jax.tree.map(zero_slots, adam.nu),
    )
    return GaussianState(params=params, alive=alive), adam, sstate


def add_noise(
    gstate: GaussianState, key: jax.Array, lr: float, cfg: MCMCStrategyConfig
):
    """Per-step covariance-shaped positional noise on near-transparent
    gaussians: means += noise_lr * lr * sigmoid-gate * R (s * eps)."""
    params, alive = gstate.params, gstate.alive
    opa = jax.nn.sigmoid(params.opacities)
    gate = jax.nn.sigmoid(-100.0 * (opa - 1.0 + 0.995))
    eps = jax.random.normal(key, params.means.shape)
    rot = quat_to_rotmat(params.quats)
    # gsplat/3DGS-MCMC transform eps by the FULL covariance
    # Sigma = R diag(s^2) R^T (not a Cholesky sample), so noise magnitude
    # scales as s^2: x = R diag(s^2) R^T eps.
    s2 = jnp.exp(2.0 * params.scales)
    sample = jnp.einsum(
        "nij,nj->ni", rot, s2 * jnp.einsum("nji,nj->ni", rot, eps)
    )
    noise = cfg.noise_lr * lr * gate[:, None] * sample
    means = jnp.where(alive[:, None], params.means + noise, params.means)
    return gstate._replace(params=params._replace(means=means))
