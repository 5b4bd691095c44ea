import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs_init_tpu.ops.ssim import psnr, ssim


def test_ssim_identical(rng):
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 40, 3)), jnp.float32)
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)


def test_ssim_decreases_with_noise(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 48, 48, 3)), jnp.float32)
    vals = []
    for sigma in [0.02, 0.1, 0.4]:
        y = x + jnp.asarray(rng.normal(0, sigma, x.shape), jnp.float32)
        vals.append(float(ssim(x, y)))
    assert vals[0] > vals[1] > vals[2]
    assert vals[0] < 1.0


def _ssim_numpy(x, y, size=11, sigma=1.5, c1=0.01**2, c2=0.03**2):
    """Direct-formula SSIM golden reference (float64, scipy convolution)."""
    from scipy.signal import convolve2d

    g = np.arange(size) - (size - 1) / 2
    g = np.exp(-(g**2) / (2 * sigma**2))
    w = np.outer(g, g)
    w /= w.sum()
    vals = []
    for c in range(x.shape[-1]):
        a, b = x[..., c].astype(np.float64), y[..., c].astype(np.float64)
        f = lambda im: convolve2d(im, w, mode="valid")
        mu0, mu1 = f(a), f(b)
        s00 = f(a * a) - mu0**2
        s11 = f(b * b) - mu1**2
        s01 = f(a * b) - mu0 * mu1
        m = ((2 * mu0 * mu1 + c1) * (2 * s01 + c2)) / (
            (mu0**2 + mu1**2 + c1) * (s00 + s11 + c2)
        )
        vals.append(m.mean())
    return float(np.mean(vals))


def test_ssim_matches_golden(rng):
    x = rng.uniform(0, 1, (33, 47, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)
    ref = _ssim_numpy(y, x)
    got = float(ssim(jnp.asarray(y)[None], jnp.asarray(x)[None]))
    assert got == pytest.approx(ref, abs=2e-4)


def test_ssim_grad(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 24, 24, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 1, (1, 24, 24, 3)), jnp.float32)
    g = jax.grad(lambda a: 1.0 - ssim(a, y))(x)
    assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).sum()) > 0
    # Gradient descent on SSIM loss improves SSIM.
    x2 = x - 50.0 * g
    assert float(ssim(x2, y)) > float(ssim(x, y))


def test_psnr():
    x = jnp.zeros((1, 8, 8, 3))
    y = jnp.full((1, 8, 8, 3), 0.1)
    assert float(psnr(x, y)) == pytest.approx(20.0, abs=1e-4)
    assert float(psnr(x, x)) > 100.0


def test_ssim_flat_background_bounded():
    """Flat (zero-variance) regions must not blow up the SSIM map: the
    variance terms are tiny differences compared against c2=9e-4, which
    catastrophically cancel if the blurs run at reduced precision (the
    TPU's default 1-pass bf16 convs produced ssim ~ 1.9 on real renders
    with black backgrounds — garbage gradients, diverging training)."""
    rng = np.random.default_rng(0)
    a = np.zeros((1, 96, 128, 3), np.float32)
    a[0, 20:60, 30:90] = rng.uniform(0, 1, (40, 60, 3))
    b = a.copy()
    b[0, 20:60, 30:90] = np.clip(
        a[0, 20:60, 30:90] + rng.normal(0, 0.05, (40, 60, 3)), 0, 1
    )
    v = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert 0.9 < v <= 1.0 + 1e-5
    assert float(ssim(jnp.asarray(a), jnp.asarray(a))) == pytest.approx(1.0, abs=1e-5)
