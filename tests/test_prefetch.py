"""Async input pipeline: BatchPrefetcher unit tests + Dataset image cache.

Reference parity target: DataLoader(num_workers=4, persistent_workers=True,
pin_memory=True) in gs_init_compare/runner.py:411-418 — decode/undistort/H2D
must come off the train loop's critical path.
"""
import threading
import time

import numpy as np
import pytest

from gs_init_tpu.datasets.prefetch import BatchPrefetcher


def test_prefetcher_covers_epoch_and_overlaps():
    seen = []
    lock = threading.Lock()

    def build(ids):
        with lock:
            seen.extend(ids)
        time.sleep(0.01)
        return tuple(ids)

    pf = BatchPrefetcher(build, n_items=6, batch_size=2, depth=2, seed=0)
    got = [pf.get() for _ in range(9)]  # 3 epochs
    pf.close()
    assert all(len(b) == 2 for b in got)
    flat = [i for b in got for i in b]
    # Each full epoch is a permutation: first 6 ids cover 0..5 exactly.
    assert sorted(flat[:6]) == list(range(6))
    assert sorted(flat[6:12]) == list(range(6))


def test_prefetcher_worker_exception_propagates():
    def build(ids):
        raise ValueError("decode failed")

    pf = BatchPrefetcher(build, n_items=4, batch_size=1, depth=1, seed=0)
    with pytest.raises(RuntimeError, match="prefetch worker died"):
        pf.get()
    pf.close()


def test_prefetcher_close_unblocks_full_queue():
    def build(ids):
        return 0

    pf = BatchPrefetcher(build, n_items=4, batch_size=1, depth=1, seed=0)
    time.sleep(0.1)  # let the worker fill the queue and block on put
    t0 = time.time()
    pf.close()
    assert time.time() - t0 < 3.0
    assert not pf._thread.is_alive()


def test_dataset_image_cache_hits(tmp_path):
    from gs_init_tpu.datasets.parser import Dataset
    from gs_init_tpu.datasets.synthetic import make_scene
    from tests.test_datasets import _write_colmap_scene
    from gs_init_tpu.datasets.nerfstudio import open_dataset

    scene = make_scene(n_gaussians=16, n_cams=4, width=32, height=24)
    d = _write_colmap_scene(tmp_path, scene)
    parser = open_dataset(d, factor=1, normalize=True, test_every=100)
    ds = Dataset(parser, "train", cache_bytes=1 << 30)
    a = ds[0]["image"]
    assert len(ds._img_cache) == 1
    b = ds[0]["image"]  # served from the uint8 cache
    # uint8 round-trip: exact for 8-bit source images.
    np.testing.assert_allclose(a, b, atol=1 / 255.0)
    # Budget of 0 disables caching.
    ds0 = Dataset(parser, "train", cache_bytes=0)
    ds0[0]
    assert len(ds0._img_cache) == 0
