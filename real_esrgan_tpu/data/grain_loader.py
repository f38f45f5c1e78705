"""Grain-based training input pipeline (deterministic, resumable, sharded).

The 5th loader variant, beyond the reference's four prefetchers (SURVEY C17):
Google's ``grain`` is the idiomatic JAX data-loading stack on TPU pods —
this wraps it with the same contract as ThreadedLoader/NativeThreadedLoader
(iterate -> uint8 (B, hr, hr, 3) HR crop batches; ``len()`` = steps/epoch)
and adds what the hand-rolled loaders cannot offer:

* **Deterministic global order**: one `IndexSampler` with a fixed seed drives
  the whole pod; each process reads only its `ShardByJaxProcess` slice — no
  per-process RNG drift, bitwise-reproducible across restarts.
* **Resumable mid-epoch**: `get_state()/set_state()` round-trips the iterator
  position (grain's PyGrainDatasetIterator state), so elastic restarts can
  continue mid-epoch instead of at epoch boundaries.
* **Process-pool workers**: decode + crop runs in `worker_count` separate
  processes (no GIL), overlapping with the device step like the reference's
  DataLoader workers (/root/reference/dataset.py:148-154).

Opt in with ``TrainConfig(loader="grain")``; ``available()`` gates the import
so environments without grain fall back to the default loader chain.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def available() -> bool:
    try:
        import grain.python  # noqa: F401

        return True
    except Exception:
        return False


class _CropSource:
    """grain RandomAccessDataSource: record k -> one uint8 HR crop.

    Deterministic per (record_key, seed): the crop offset is derived from the
    record key, not from worker-local RNG state, so any worker (or a resumed
    run) produces the identical crop for the same key.
    """

    def __init__(self, files, hr_size: int, seed: int):
        self._files = list(files)
        self.hr_size = hr_size
        self.seed = seed

    def __repr__(self) -> str:
        # stable across instances/processes: grain validates checkpointed
        # iterator state against repr(data_source)
        return (f"_CropSource(n={len(self._files)}, hr={self.hr_size}, "
                f"seed={self.seed})")

    def __len__(self) -> int:
        return len(self._files)

    def __getitem__(self, record_key: int) -> np.ndarray:
        import cv2

        path = self._files[record_key % len(self._files)]
        bgr = cv2.imread(path, cv2.IMREAD_COLOR)
        img = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        h, w, _ = img.shape
        s = self.hr_size
        if h < s or w < s:  # reflect-pad small images (dataset.py contract)
            img = np.pad(img, ((0, max(0, s - h)), (0, max(0, s - w)), (0, 0)),
                         mode="reflect")
            h, w, _ = img.shape
        rng = np.random.default_rng((self.seed, record_key))
        y0 = int(rng.integers(0, h - s + 1))
        x0 = int(rng.integers(0, w - s + 1))
        return np.ascontiguousarray(img[y0:y0 + s, x0:x0 + s])


class GrainLoader:
    """Deterministic sharded HR-crop batch loader over grain."""

    def __init__(self, files, batch: int, hr_size: int, num_workers: int = 4,
                 seed: int = 0, shard_id: int = 0, num_shards: int = 1,
                 num_epochs: Optional[int] = None):
        import grain.python as pg

        self.batch = batch
        self._steps = max(1, len(files) // (batch * num_shards))
        source = _CropSource(files, hr_size, seed)
        sampler = pg.IndexSampler(
            num_records=len(source),
            shard_options=pg.ShardOptions(shard_index=shard_id,
                                          shard_count=num_shards,
                                          drop_remainder=True),
            shuffle=True,
            num_epochs=num_epochs,
            seed=seed)
        self._loader = pg.DataLoader(
            data_source=source,
            sampler=sampler,
            operations=[pg.Batch(batch_size=batch, drop_remainder=True)],
            worker_count=num_workers)
        self._it = None

    def __len__(self) -> int:
        return self._steps

    def __iter__(self):
        # one persistent grain iterator; each trainer epoch draws
        # len(self) batches from the global deterministic stream
        if self._it is None:
            self._it = iter(self._loader)
        for _ in range(self._steps):
            yield np.asarray(next(self._it))

    # ---- elastic mid-epoch resume ----
    def get_state(self):
        if self._it is None:
            self._it = iter(self._loader)
        return self._it.get_state()

    def set_state(self, state) -> None:
        if self._it is None:
            self._it = iter(self._loader)
        self._it.set_state(state)
