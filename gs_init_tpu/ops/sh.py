"""Real spherical-harmonics color evaluation (degrees 0..3).

TPU-native replacement for gsplat's SH kernels (used by the reference via
``gsplat.rasterization(..., sh_degree=...)``, runner.py:341-362, and
``_eval_sh_bases_fast`` in utils/runner_utils.py:92). Pure XLA elementwise —
fuses into the projection pass.
"""
from __future__ import annotations

import jax.numpy as jnp

_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)

NUM_SH_BASES = {0: 1, 1: 4, 2: 9, 3: 16}


def num_sh_bases(degree: int) -> int:
    return NUM_SH_BASES[degree]


def eval_sh_bases(degree: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH basis functions at unit directions.

    Args:
      degree: max SH degree in [0, 3].
      dirs: [..., 3] unit view directions.
    Returns:
      [..., num_bases] basis values.
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ones = jnp.ones_like(x)
    out = [_C0 * ones]
    if degree >= 1:
        out += [-_C1 * y, _C1 * z, -_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            _C2[0] * xy,
            _C2[1] * yz,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz,
            _C2[4] * (xx - yy),
        ]
    if degree >= 3:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            _C3[0] * y * (3.0 * xx - yy),
            _C3[1] * xy * z,
            _C3[2] * y * (4.0 * zz - xx - yy),
            _C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            _C3[4] * x * (4.0 * zz - xx - yy),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(out, axis=-1)


def sh_to_color(
    sh_coeffs: jnp.ndarray, dirs: jnp.ndarray, degree: int,
    basis_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Convert SH coefficients to RGB for given view directions.

    Args:
      sh_coeffs: [..., K, 3] coefficients with K >= num_bases(degree).
      dirs: [..., 3] (not necessarily normalized) view directions.
      degree: active SH degree (coefficients above it are ignored, which
        implements the reference's +1-degree-per-1000-steps schedule,
        runner.py:464, without reshaping buffers).
      basis_mask: optional [num_bases(degree)] 0/1 schedule mask. Applying
        it to the BASIS instead of the coefficients keeps the per-step
        degree schedule out of the [N, K, 3] coefficient buffer (masking
        coefficients costs a full-buffer copy + its VJP every step).
    Returns:
      [..., 3] RGB in [0, inf) — offset by +0.5 and clamped at 0 as in 3DGS.
    """
    n = dirs / jnp.maximum(
        jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12
    )
    basis = eval_sh_bases(degree, n)  # [..., B]
    if basis_mask is not None:
        basis = basis * basis_mask
    b = basis.shape[-1]
    color = jnp.einsum("...k,...kc->...c", basis, sh_coeffs[..., :b, :])
    return jnp.maximum(color + 0.5, 0.0)
