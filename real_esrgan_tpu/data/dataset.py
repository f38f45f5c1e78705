"""Host-side datasets and a threaded batch loader.

Re-design of the reference's dataset layer (/root/reference/dataset.py):

* ``TrainImageDataset`` ships ONLY uint8 HR crops — augmentation, kernel
  synthesis and the entire degradation chain moved on-device
  (ops/degradation.py), so host workers just decode PNGs.  The reference
  instead synthesizes three blur kernels per sample in DataLoader workers
  (dataset.py:81-141) and ships float32 tensors; shipping uint8 is 4x less
  host->device traffic.
* ``ValidImageDataset`` center-crops and makes the bicubic LR pair
  (dataset.py:145-160) with the MATLAB-exact resize.
* ``TestImageDataset`` pairs LR/HR directories (dataset.py:166-197).
* ``ThreadedLoader`` replaces torch's DataLoader + PrefetchGenerator
  (dataset.py:200-243): a pool of decode threads (cv2 releases the GIL)
  feeding a bounded queue, assembled into contiguous batches.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Dict, Iterator, List, Optional

import cv2
import numpy as np
import jax.numpy as jnp

from real_esrgan_tpu.ops.resize import matlab_resize

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp", ".tif", ".tiff", ".ppm", ".gif")


def _list_images(directory: str) -> List[str]:
    names = sorted(f for f in os.listdir(directory)
                   if f.lower().endswith(_IMG_EXTS))
    if not names:
        raise FileNotFoundError(f"No images found in {directory}")
    return [os.path.join(directory, f) for f in names]


class TrainImageDataset:
    """Yields uint8 RGB HR crops of exactly ``hr_size``.

    ``cache_bytes`` > 0 keeps decoded (pre-crop) images in RAM so epoch
    loops stop re-decoding the same files — first-fit, no eviction; a
    dataset over budget caches its head and decodes its tail.  Crops stay
    random per call.  (The native C++ loader has its own twin cache.)
    """

    def __init__(self, image_dir: str, hr_size: int, cache_bytes: int = 0):
        self.files = _list_images(image_dir)
        self.hr_size = hr_size
        self._cache: Dict[int, np.ndarray] = {}
        self._cache_left = cache_bytes

    def __len__(self):
        return len(self.files)

    def _decode(self, index: int) -> np.ndarray:
        cached = self._cache.get(index)
        if cached is not None:
            return cached
        bgr = cv2.imread(self.files[index], cv2.IMREAD_COLOR)
        img = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        h, w = img.shape[:2]
        s = self.hr_size
        if h < s or w < s:  # reflect-pad small images up to crop size
            img = cv2.copyMakeBorder(img, 0, max(0, s - h), 0, max(0, s - w),
                                     cv2.BORDER_REFLECT_101)
        if img.nbytes <= self._cache_left:
            self._cache_left -= img.nbytes  # GIL-atomic enough: worst case a
            self._cache[index] = img        # racing thread re-decodes once
        return img

    def load(self, index: int, rng: np.random.Generator) -> np.ndarray:
        img = self._decode(index)
        h, w = img.shape[:2]
        s = self.hr_size
        top = int(rng.integers(0, h - s + 1))
        left = int(rng.integers(0, w - s + 1))
        return img[top:top + s, left:left + s]


class ValidImageDataset:
    """Center-crop HR + MATLAB-bicubic LR pairs (reference dataset.py:145-160)."""

    def __init__(self, image_dir: str, crop_size: int, scale: int):
        self.files = _list_images(image_dir)
        self.crop_size = crop_size
        self.scale = scale

    def __len__(self):
        return len(self.files)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        bgr = cv2.imread(self.files[index], cv2.IMREAD_COLOR)
        img = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        h, w = img.shape[:2]
        s = min(self.crop_size, (min(h, w) // self.scale) * self.scale)
        top, left = (h - s) // 2, (w - s) // 2
        hr = img[top:top + s, left:left + s]
        lr = np.asarray(matlab_resize(jnp.asarray(hr), 1.0 / self.scale))
        return {"lr": lr, "hr": hr}


class TestImageDataset:
    """Paired LR/HR directory reader (reference dataset.py:166-197)."""

    def __init__(self, lr_dir: str, hr_dir: str):
        self.lr_files = _list_images(lr_dir)
        self.hr_files = [os.path.join(hr_dir, os.path.basename(f))
                         for f in self.lr_files]

    def __len__(self):
        return len(self.lr_files)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        def read(path):
            return cv2.cvtColor(cv2.imread(path, cv2.IMREAD_COLOR),
                                cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0

        return {"lr": read(self.lr_files[index]), "hr": read(self.hr_files[index])}


def build_eval_datasets(valid_dir: str, test_lr_dir: str, test_hr_dir: str,
                        crop_size: int, scale: int):
    """Per-epoch eval datasets, tolerating absent directories.

    The reference hard-fails at import of its eval dirs (dataset.py:178
    os.listdir); here a missing directory downgrades to an empty dataset
    with a warning so a training run configured for a machine that has
    Set5/DIV2K-valid still works on one that doesn't (both trainers already
    handle empty eval sets — that is --synthetic's normal state).
    """
    if os.path.isdir(valid_dir):
        valid_ds = ValidImageDataset(valid_dir, crop_size, scale)
    else:
        valid_ds = []
        print(f"Validation dir `{valid_dir}` not found - skipping the "
              f"per-epoch valid NIQE eval.")
    if os.path.isdir(test_lr_dir) and os.path.isdir(test_hr_dir):
        test_ds = TestImageDataset(test_lr_dir, test_hr_dir)
    else:
        test_ds = []
        print(f"Test pair dirs `{test_lr_dir}` / `{test_hr_dir}` not found - "
              f"skipping the per-epoch test NIQE eval.")
    return valid_ds, test_ds


class ThreadedLoader:
    """Shuffling, batching loader with decode worker threads.

    Yields (batch_size, hr_size, hr_size, 3) uint8 arrays per step; drops the
    ragged tail (the reference sets drop_last=True, dataset.py:153).
    """

    def __init__(self, dataset: TrainImageDataset, batch_size: int,
                 num_workers: int = 4, seed: int = 0, prefetch: int = 4,
                 shard_id: int = 0, num_shards: int = 1):
        """``shard_id``/``num_shards``: multi-host data parallelism — every
        host draws the SAME seeded shuffle and takes a disjoint, equal-length
        stride of it, so global coverage is exact and per-host step counts
        match (required for collectives to stay in lockstep)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self.shard_id = shard_id
        self.num_shards = max(1, num_shards)
        self.epoch = 0

    def __len__(self):
        return (len(self.dataset) // self.num_shards) // self.batch_size

    def __iter__(self) -> Iterator[np.ndarray]:
        n = len(self.dataset)
        epoch = self.epoch
        order = np.random.default_rng(self.seed + epoch).permutation(n)
        self.epoch += 1
        usable = ((n // self.num_shards) // self.batch_size) * self.batch_size
        order = order[self.shard_id::self.num_shards][:usable]

        index_q: "queue.Queue" = queue.Queue()
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch * self.batch_size)
        for pos, idx in enumerate(order):
            index_q.put((pos, int(idx)))
        for _ in range(self.num_workers):
            index_q.put(None)

        def worker(wid: int):
            while True:
                item = index_q.get()
                if item is None:
                    out_q.put(None)
                    return
                pos, idx = item
                # crop RNG keyed by (seed, epoch, sample index) — the same
                # discipline as the native C++ loader, so batch content is
                # reproducible regardless of thread scheduling
                rng = np.random.default_rng((self.seed, epoch, idx))
                try:
                    out_q.put((pos, self.dataset.load(idx, rng)))
                except Exception as exc:  # surface decode errors, keep going
                    out_q.put(exc)

        threads = [threading.Thread(target=worker, args=(i,), daemon=True)
                   for i in range(self.num_workers)]
        for t in threads:
            t.start()

        # Reassemble in shuffled-order position sequence (not completion
        # order): with a fixed seed every run yields identical batches.
        finished = 0
        pending: Dict[int, np.ndarray] = {}
        next_pos = 0
        batch: List[np.ndarray] = []
        while finished < self.num_workers and next_pos < usable:
            item = out_q.get()
            if item is None:
                finished += 1
                continue
            if isinstance(item, Exception):
                raise item
            pos, arr = item
            pending[pos] = arr
            while next_pos in pending:
                batch.append(pending.pop(next_pos))
                next_pos += 1
                if len(batch) == self.batch_size:
                    yield np.stack(batch)
                    batch = []
