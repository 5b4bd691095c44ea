"""RANSAC / MSAC scale+shift alignment — all hypotheses as one vmapped batch.

The reference runs a locally-optimized serial loop with adaptive termination
(depth_alignment/alignment/ransacs.py:100-189, defaults thresh 0.01 on
squared error, 2500 iters, conf 0.999, sample 4). On TPU the whole
hypothesis set is evaluated at once — cost is one [HYP, M] elementwise pass
plus reductions, so adaptive early exit buys nothing; instead we always
evaluate max_iterations hypotheses (>= the serial algorithm's coverage) and
then run a fixed number of locally-optimized refits (least squares on the
inlier set) starting from the best hypothesis.

Loss semantics match the reference exactly:
  dists = (s*pred + t - gt)^2
  RANSAC loss = #(dists >= thresh); MSAC loss = sum(min(dists, thresh)).

One deliberate improvement over the reference: hypotheses (and LO refits)
with scale <= 0 are rejected outright. Monocular depth predictions are
positively correlated with true depth by construction, so a non-positive
scale is always a degenerate fit — yet when the SfM correspondences span a
narrow depth range, a constant/negative model can inlier-count as well as
the true one (observed on the clustered e2e proxy: recovered s = -0.40).
The reference would return that fit; we discard it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .lstsqrs import weighted_scale_shift


def _masked_median(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Median over the valid entries (jittable: sort with +inf padding)."""
    n = jnp.sum(valid.astype(jnp.int32))
    s = jnp.sort(jnp.where(valid, x, jnp.inf))
    return s[jnp.maximum(n - 1, 0) // 2]


@functools.partial(
    jax.jit, static_argnames=("num_hyp", "sample_size", "msac", "lo_iters")
)
def ransac_scale_shift(
    pred: jnp.ndarray,  # [M] predicted depths at correspondences (padded)
    gt: jnp.ndarray,  # [M] SfM depths
    valid: jnp.ndarray,  # [M] bool (padding = False)
    key: jax.Array,
    inlier_threshold: float = 0.01,
    num_hyp: int = 2500,
    sample_size: int = 4,
    msac: bool = False,
    lo_iters: int = 3,
):
    """Returns (s, t, inlier_mask [M])."""
    m = pred.shape[0]
    wvalid = valid.astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(wvalid), 1.0)

    # Sample hypotheses: random correspondence indices, biased away from
    # padding by sampling positions among valid entries via gumbel trick.
    def sample_idx(k):
        # categorical over valid entries, sample_size draws without strict
        # dedup (duplicates yield degenerate fits that lose the loss race).
        logits = jnp.where(valid, 0.0, -jnp.inf)
        return jax.random.categorical(k, logits, shape=(sample_size,))

    keys = jax.random.split(key, num_hyp)
    idx = jax.vmap(sample_idx)(keys)  # [HYP, S]

    sp = pred[idx]  # [HYP, S]
    sg = gt[idx]
    s_h, t_h = weighted_scale_shift(sp, sg, jnp.ones_like(sp))  # [HYP]

    dists = (s_h[:, None] * pred[None, :] + t_h[:, None] - gt[None, :]) ** 2
    dists = jnp.where(valid[None, :], dists, 0.0)  # padding never counts
    if msac:
        losses = jnp.sum(jnp.minimum(dists, inlier_threshold), axis=1)
    else:
        losses = jnp.sum(
            jnp.where(valid[None, :], dists >= inlier_threshold, False), axis=1
        ).astype(jnp.float32)
    # Physical prior: depth scale must be positive (see module docstring).
    losses = jnp.where(s_h > 0.0, losses, jnp.inf)
    best = jnp.argmin(losses)
    s_best, t_best = s_h[best], t_h[best]

    # Locally-optimized refits on the inlier set.
    def lo_step(carry, _):
        s, t, best_loss = carry
        d = (s * pred + t - gt) ** 2
        inl = valid & (d < inlier_threshold)
        s2, t2 = weighted_scale_shift(pred, gt, inl.astype(jnp.float32))
        d2 = jnp.where(valid, (s2 * pred + t2 - gt) ** 2, 0.0)
        if msac:
            l2 = jnp.sum(jnp.minimum(d2, inlier_threshold))
        else:
            l2 = jnp.sum(jnp.where(valid, d2 >= inlier_threshold, False)).astype(
                jnp.float32
            )
        better = (l2 < best_loss) & (s2 > 0.0)
        return (
            jnp.where(better, s2, s),
            jnp.where(better, t2, t),
            # Accept-only update: best_loss must stay the loss of the held
            # (s, t); lowering it on a rejected (s2 <= 0) refit would let a
            # poisoned bound reject strictly better positive-scale refits.
            jnp.where(better, l2, best_loss),
        ), None

    (s_fin, t_fin, _), _ = jax.lax.scan(
        lo_step, (s_best, t_best, losses[best]), None, length=lo_iters
    )
    # Terminal fallback: if EVERY hypothesis had s <= 0 (flat predicted
    # depth, degenerate SfM range), argmin over all-inf losses returns an
    # arbitrary non-positive fit and the LO gate can never fix it. Fall
    # back to the robust median-ratio alignment rather than silently
    # returning an inverted scale. lax.cond keeps the two O(M log M)
    # median sorts off the common positive-scale path (this runs per
    # region per image at init time).
    def _fallback(_):
        gt_med = _masked_median(gt, valid)
        pred_med = _masked_median(pred, valid)
        s = jnp.maximum(gt_med / jnp.maximum(pred_med, 1e-12), 1e-12)
        return s, jnp.float32(0.0)

    s_fin, t_fin = jax.lax.cond(
        s_fin <= 0.0, _fallback, lambda _: (s_fin, t_fin), None
    )
    inliers = valid & ((s_fin * pred + t_fin - gt) ** 2 < inlier_threshold)
    return s_fin, t_fin, inliers
