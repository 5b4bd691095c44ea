import jax
import jax.numpy as jnp
import numpy as np

from gs_init_tpu.ops.projection import project_gaussians
from gs_init_tpu.ops.rasterize_ref import rasterize_reference


def _scene(rng, n=64, width=64, height=48, f=60.0, seed_depth=2.0):
    K = jnp.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], jnp.float32)
    viewmat = jnp.eye(4, dtype=jnp.float32)
    means = jnp.asarray(
        np.stack(
            [
                rng.uniform(-0.6, 0.6, n),
                rng.uniform(-0.45, 0.45, n),
                rng.uniform(1.0, 4.0, n) + seed_depth - 2.0,
            ],
            axis=-1,
        ),
        jnp.float32,
    )
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    scales = jnp.asarray(rng.uniform(0.02, 0.12, size=(n, 3)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.95, size=(n,)), jnp.float32)
    colors = jnp.asarray(rng.uniform(0, 1, size=(n, 3)), jnp.float32)
    return means, quats, scales, opac, colors, viewmat[None], K[None]


def test_render_shapes_and_ranges(rng):
    means, quats, scales, opac, colors, viewmats, Ks = _scene(rng)
    proj = project_gaussians(means, quats, scales, opac, viewmats, Ks, 64, 48)
    color, alpha, depth = rasterize_reference(proj, colors[None], 64, 48)
    assert color.shape == (1, 48, 64, 3)
    assert alpha.shape == (1, 48, 64)
    a = np.asarray(alpha)
    assert (a >= 0).all() and (a <= 1.0 + 1e-5).all()
    c = np.asarray(color)
    assert (c >= 0).all() and np.isfinite(c).all()
    d = np.asarray(depth)
    assert (d >= 0).all() and d.max() <= 5.0  # expected depth bounded by scene


def test_single_gaussian_peak(rng):
    K = jnp.array([[60.0, 0, 32.0], [0, 60.0, 24.0], [0, 0, 1]], jnp.float32)
    viewmat = jnp.eye(4, dtype=jnp.float32)
    proj = project_gaussians(
        jnp.array([[0.0, 0.0, 2.0]]),
        jnp.array([[1.0, 0, 0, 0]]),
        jnp.array([[0.15, 0.15, 0.15]]),
        jnp.array([0.95]),
        viewmat[None],
        K[None],
        64,
        48,
    )
    color, alpha, _ = rasterize_reference(
        proj, jnp.array([[[1.0, 0.0, 0.0]]]), 64, 48
    )
    a = np.asarray(alpha[0])
    iy, ix = np.unravel_index(a.argmax(), a.shape)
    assert abs(ix - 32) <= 1 and abs(iy - 24) <= 1
    # Red channel dominates where alpha is significant.
    c = np.asarray(color[0])
    assert c[iy, ix, 0] > 0.5 and c[iy, ix, 1] < 1e-3


def test_occlusion_order(rng):
    """A nearer opaque gaussian must occlude a farther one."""
    K = jnp.array([[60.0, 0, 32.0], [0, 60.0, 24.0], [0, 0, 1]], jnp.float32)
    viewmat = jnp.eye(4, dtype=jnp.float32)
    means = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 4.0]])
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
    scales = jnp.full((2, 3), 0.3)
    # Near one highly opaque red; far one green.
    opac = jnp.array([0.99, 0.99])
    colors = jnp.array([[[1.0, 0, 0], [0, 1.0, 0]]])
    proj = project_gaussians(means, quats, scales, opac, viewmat[None], K[None], 64, 48)
    color, _, depth = rasterize_reference(proj, colors, 64, 48)
    c = np.asarray(color[0, 24, 32])
    assert c[0] > 5 * max(c[1], 1e-6)
    # Expected depth at center ~ near gaussian depth.
    assert abs(float(depth[0, 24, 32]) - 2.0) < 0.3


def test_background_blend(rng):
    means, quats, scales, opac, colors, viewmats, Ks = _scene(rng, n=4)
    proj = project_gaussians(means, quats, scales, opac, viewmats, Ks, 64, 48)
    bg = jnp.array([[0.0, 0.0, 1.0]])
    color, alpha, _ = rasterize_reference(proj, colors[None], 64, 48, backgrounds=bg)
    c = np.asarray(color[0])
    a = np.asarray(alpha[0])
    empty = a < 1e-4
    assert empty.any()
    np.testing.assert_allclose(c[empty][:, 2], 1.0, atol=1e-3)


def test_gradients_finite(rng):
    means, quats, scales, opac, colors, viewmats, Ks = _scene(rng, n=16)

    def loss(means, quats, scales, opac, colors):
        proj = project_gaussians(means, quats, scales, opac, viewmats, Ks, 32, 24)
        color, alpha, _ = rasterize_reference(proj, colors[None], 32, 24)
        return jnp.sum(color**2) + jnp.sum(alpha)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        means, quats, scales, opac, colors
    )
    total = 0.0
    for g in grads:
        assert bool(jnp.isfinite(g).all())
        total += float(jnp.abs(g).sum())
    assert total > 0


def test_finite_difference_opacity(rng):
    """Autodiff gradient of opacity matches finite differences."""
    means, quats, scales, opac, colors, viewmats, Ks = _scene(rng, n=8)

    def loss(o):
        proj = project_gaussians(means, quats, scales, o, viewmats, Ks, 32, 24)
        color, _, _ = rasterize_reference(proj, colors[None], 32, 24)
        return jnp.sum(color)

    g = jax.grad(loss)(opac)
    eps = 1e-3
    for i in range(4):
        e = jnp.zeros_like(opac).at[i].set(eps)
        fd = (loss(opac + e) - loss(opac - e)) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=0.05, atol=5e-2)
