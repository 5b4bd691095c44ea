"""Per-parameter Adam for gaussian buffers.

Mirrors the reference's one-Adam-per-parameter setup (runner.py:128-137)
including batch-size corrections: lr * sqrt(BS), betas ** BS, eps / sqrt(BS).
Implemented directly (not via optax.chain) so densification strategies can
surgically zero first/second moments of relocated slots — the JAX equivalent
of gsplat's optimizer-state surgery.

The means learning rate follows the reference's ExponentialLR with
gamma = 0.01 ** (1 / max_steps) (runner.py:381-387).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .params import GaussianParams


class AdamState(NamedTuple):
    mu: GaussianParams
    nu: GaussianParams
    count: jnp.ndarray  # [] int32


class SimpleAdamState(NamedTuple):
    """Generic Adam state for auxiliary parameter groups (pose, appearance,
    bilateral grids) — any pytree."""

    mu: object
    nu: object
    count: jnp.ndarray


def simple_adam_init(params) -> SimpleAdamState:
    # mu and nu must be INDEPENDENT zero trees (not two references to one):
    # the jitted train step donates the optimizer state, and XLA refuses to
    # donate the same buffer twice in one Execute().
    return SimpleAdamState(
        mu=jax.tree.map(jnp.zeros_like, params),
        nu=jax.tree.map(jnp.zeros_like, params),
        count=jnp.zeros((), jnp.int32),
    )


def simple_adam_update(
    params,
    grads,
    state: SimpleAdamState,
    lr,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
):
    """AdamW-style update over an arbitrary pytree; returns (params, state)."""
    count = state.count + 1
    cf = count.astype(jnp.float32)
    bc1 = 1.0 - b1**cf
    bc2 = 1.0 - b2**cf
    if weight_decay:
        grads = jax.tree.map(lambda g, p: g + weight_decay * p, grads, params)
    mu = jax.tree.map(lambda g, m: b1 * m + (1 - b1) * g, grads, state.mu)
    nu = jax.tree.map(lambda g, v: b2 * v + (1 - b2) * g * g, grads, state.nu)
    params = jax.tree.map(
        lambda p, m, v: p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps),
        params,
        mu,
        nu,
    )
    return params, SimpleAdamState(mu=mu, nu=nu, count=count)


class AdamConfig(NamedTuple):
    lrs: GaussianParams  # static per-leaf base learning rates
    b1: float
    b2: float
    eps: float
    means_decay_gamma: float  # per-step multiplicative decay for means lr


def make_adam_config(cfg, scene_scale: float, batch_size: int = 1) -> AdamConfig:
    bs = batch_size * max(cfg.data_parallel, 1)
    s = math.sqrt(bs)
    lrs = GaussianParams(
        means=cfg.means_lr * scene_scale * s,
        quats=cfg.quats_lr * s,
        scales=cfg.scales_lr * s,
        opacities=cfg.opacities_lr * s,
        sh0=cfg.sh0_lr * s,
        shN=cfg.shN_lr * s,
    )
    return AdamConfig(
        lrs=lrs,
        b1=0.9**bs,
        b2=0.999**bs,
        eps=1e-15 / s,
        means_decay_gamma=0.01 ** (1.0 / max(cfg.max_steps, 1)),
    )


def init_adam_state(params: GaussianParams) -> AdamState:
    # mu and nu must be INDEPENDENT zero trees — see simple_adam_init.
    return AdamState(
        mu=jax.tree.map(jnp.zeros_like, params),
        nu=jax.tree.map(jnp.zeros_like, params),
        count=jnp.zeros((), jnp.int32),
    )


def adam_update(
    params: GaussianParams,
    grads: GaussianParams,
    state: AdamState,
    acfg: AdamConfig,
    step: jnp.ndarray,
):
    """One Adam step; returns (new_params, new_state)."""
    count = state.count + 1
    cf = count.astype(jnp.float32)
    bc1 = 1.0 - acfg.b1**cf
    bc2 = 1.0 - acfg.b2**cf
    means_scale = acfg.means_decay_gamma ** step.astype(jnp.float32)
    lr_scales = GaussianParams(
        means=means_scale, quats=1.0, scales=1.0, opacities=1.0, sh0=1.0, shN=1.0
    )

    new_mu = jax.tree.map(
        lambda g, m: acfg.b1 * m + (1 - acfg.b1) * g, grads, state.mu
    )
    new_nu = jax.tree.map(
        lambda g, v: acfg.b2 * v + (1 - acfg.b2) * g * g, grads, state.nu
    )
    new_params = jax.tree.map(
        lambda p, m, v, lr, ls: p
        - lr * ls * (m / bc1) / (jnp.sqrt(v / bc2) + acfg.eps),
        params,
        new_mu,
        new_nu,
        acfg.lrs,
        lr_scales,
    )
    return new_params, AdamState(mu=new_mu, nu=new_nu, count=count)
