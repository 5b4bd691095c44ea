"""Async input pipeline: background batch prefetch with a bounded queue.

Reference parity: the reference trains behind
``DataLoader(num_workers=4, persistent_workers=True, pin_memory=True)``
(gs_init_compare/runner.py:411-418) so JPEG decode + undistort + H2D never
sit on the critical path. Here one daemon thread builds whole device-ready
batches (decode -> undistort -> stack -> device_put) ``depth`` steps ahead;
``device_put`` is async, so by the time the train loop dequeues a batch its
transfer has typically already landed. The TPU step itself is dispatched
from the main thread only, keeping a single stream of XLA executions.

Threads, not processes: the hot work (cv2.remap, JPEG decode via imageio)
releases the GIL, and JAX arrays cannot cross process boundaries without a
serialize/copy that would cost more than the decode.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, List, Optional

import numpy as np


class BatchPrefetcher:
    """Builds batches on a daemon thread, ``depth`` ahead of the consumer.

    ``build(ids)`` must be thread-safe with respect to the training loop:
    it may read immutable runner state (datasets, static pose perturbation,
    shardings) but must not touch the mutable training state. Epoch
    permutations are drawn from this object's own numpy Generator, so the
    main loop's PRNG key stream is untouched (and unraced).
    """

    _SENTINEL = object()

    def __init__(
        self,
        build: Callable[[List[int]], object],
        n_items: int,
        batch_size: int,
        depth: int = 2,
        seed: int = 0,
    ):
        if n_items <= 0:
            raise ValueError("empty dataset")
        self._build = build
        self._n = n_items
        self._bs = batch_size
        self._rng = np.random.default_rng(seed)
        self._perm: List[int] = []
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._exc: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._worker, name="batch-prefetch", daemon=True
        )
        self._thread.start()

    def _next_ids(self) -> List[int]:
        ids = []
        for _ in range(self._bs):
            if not self._perm:
                self._perm = list(self._rng.permutation(self._n))
            ids.append(int(self._perm.pop()))
        return ids

    def _worker(self):
        try:
            while not self._stop.is_set():
                batch = self._build(self._next_ids())
                # Bounded put that stays responsive to close().
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=0.25)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # propagate to the consumer
            self._exc = e
            try:
                self._q.put(self._SENTINEL, timeout=1.0)
            except queue.Full:
                pass

    def get(self):
        """Next prefetched batch; re-raises any worker exception."""
        item = self._q.get()
        if item is self._SENTINEL:
            raise RuntimeError("batch prefetch worker died") from self._exc
        return item

    def close(self):
        self._stop.set()
        # Drain so a blocked put() wakes up promptly.
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)
