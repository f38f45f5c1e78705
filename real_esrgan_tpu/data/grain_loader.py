"""Grain-based training input pipeline (deterministic, resumable, sharded).

The 5th loader variant, beyond the reference's four prefetchers (SURVEY C17):
Google's ``grain`` is the idiomatic JAX data-loading stack on TPU pods —
this wraps it with the same contract as ThreadedLoader/NativeThreadedLoader
(iterate -> uint8 (B, hr, hr, 3) HR crop batches; ``len()`` = steps/epoch)
and adds what the hand-rolled loaders cannot offer:

* **Deterministic global order**: one `IndexSampler` with a fixed seed drives
  the whole pod; each process reads only its `ShardByJaxProcess` slice — no
  per-process RNG drift, bitwise-reproducible across restarts.
* **Resumable stream position**: `get_state()/set_state()` round-trips the
  iterator position (grain's PyGrainDatasetIterator state).  The trainers
  persist it per process at every saving epoch (`save_loader_state`) and
  restore it on elastic restart (`restore_loader_state`), so a resumed run
  CONTINUES the deterministic global stream instead of replaying it from
  record 0; snapshotting mid-epoch works too via the same API.
* **Process-pool workers**: decode + crop runs in `worker_count` separate
  processes (no GIL), overlapping with the device step like the reference's
  DataLoader workers (/root/reference/dataset.py:148-154).

Opt in with ``TrainConfig(loader="grain")``; ``available()`` gates the import
so environments without grain fall back to the default loader chain.
"""

from __future__ import annotations

import os
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
        if bgr is None:  # match imgio.load_image_rgb: name the bad file
            raise FileNotFoundError(f"unreadable image: {path}")
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

    # ---- elastic resume ----
    def get_state(self) -> bytes:
        if self._it is None:
            self._it = iter(self._loader)
        return bytes(self._it.get_state())

    def set_state(self, state: bytes) -> None:
        if self._it is None:
            self._it = iter(self._loader)
        self._it.set_state(state)


def _state_path(samples_dir: str, process_index: int) -> str:
    return os.path.join(samples_dir, f"loader_state_p{process_index}.bin")


def save_loader_state(loader, samples_dir: str, epoch: int,
                      process_index: int = 0) -> None:
    """Persist ``loader``'s stream position, tagged with the epoch it
    corresponds to.  No-op for loaders without ``get_state`` (the stateless
    threaded/native loaders reseed per epoch and need nothing).  Written per
    PROCESS to local disk — each pod host owns its shard's iterator, so the
    state never crosses hosts."""
    if not hasattr(loader, "get_state"):
        return
    path = _state_path(samples_dir, process_index)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(int(epoch).to_bytes(8, "little") + loader.get_state())
    os.replace(tmp, path)


def restore_loader_state(loader, samples_dir: str, epoch: int,
                         process_index: int = 0) -> bool:
    """Restore the stream position saved for ``epoch`` (the resumed run's
    start epoch).  Returns False — stream restarts from record 0, the
    pre-wiring behavior — when the loader is stateless, no state file
    exists, or the file's epoch tag does not match (e.g. the process died
    between the loader-state write and the checkpoint's async completion)."""
    if not hasattr(loader, "set_state") or epoch <= 0:
        return False
    path = _state_path(samples_dir, process_index)
    if not os.path.exists(path):
        return False
    with open(path, "rb") as f:
        blob = f.read()
    if int.from_bytes(blob[:8], "little") != epoch:
        print(f"WARNING: {path} is for a different epoch than the resumed "
              f"checkpoint; the data stream restarts from record 0.")
        return False
    loader.set_state(blob[8:])
    return True
