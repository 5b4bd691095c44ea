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
