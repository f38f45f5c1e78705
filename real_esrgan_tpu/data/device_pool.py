"""Device-resident training pool: the whole HR crop set lives in HBM.

The host loaders (ThreadedLoader / NativeThreadedLoader / GrainLoader) stream
a freshly decoded uint8 batch to the device every step — the reference's
design (/root/reference/dataset.py:117-160 decodes per item and
CUDAPrefetcher ships per batch).  On a TPU that is backwards twice over:

* The step path pays a host->device transfer (PCIe or, on a relayed chip,
  an HTTP hop) for data that never changes between epochs — a crop dataset
  (450 x 400x400x3 uint8 = 216 MB for InEnv10; the reference's own
  ``prepare_dataset.py`` emits fixed 400px sub-images) fits in HBM hundreds
  of times over.
* On the axon-relayed TPU specifically, EVERY host->device transfer leaks
  its full buffer in host RAM (measured: 7.3 MB per bs16 batch, linear,
  `del` does not free it) — the round-5 stage-1 run leaked 128 GB in 300
  epochs and wedged the machine at the epoch-300 checkpoint
  (docs/ROUND5_NOTES.md).

``DevicePoolLoader`` uploads the stacked pool ONCE and thereafter gathers
each batch by index inside a tiny jitted program.  Steady-state per-step
transfer volume drops from the batch (megabytes) to the index vector
(~64 bytes) — a ~10^5 reduction — and the step path has zero host decode.
Sampling semantics mirror ThreadedLoader: epoch-seeded global permutation,
ragged tail dropped.  Per-epoch random-crop jitter is lost (the pool is
built from one deterministic decode), which is exact for the production
fixed-size-crop datasets this loader gates itself to; geometric augmentation
stays fully random because it runs on-device inside ops/degradation.degrade.
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import numpy as np


def build_pool_array(dataset, hr_size: int,
                     budget_bytes: int) -> Optional[np.ndarray]:
    """Decode ``dataset`` into one (N, hr_size, hr_size, 3) uint8 stack.

    Returns None — caller falls back to a host streaming loader — when the
    stack would exceed ``budget_bytes`` or any source image is not exactly
    pool-shaped (a larger image means the host loader's per-epoch random
    crop is load-bearing and a one-shot pool would freeze it).
    """
    n = len(dataset)
    if n == 0 or n * hr_size * hr_size * 3 > budget_bytes:
        return None
    rng = np.random.default_rng(0)
    images = []
    for i in range(n):
        decode = getattr(dataset, "_decode", None)
        img = decode(i) if decode is not None else dataset.load(i, rng)
        if img.shape != (hr_size, hr_size, 3) or img.dtype != np.uint8:
            return None
        images.append(img)
    return np.stack(images)


class DevicePoolLoader:
    """Epoch iterator yielding DEVICE-resident uint8 HR batches.

    Single-process only (multi-host pods keep the sharded host loaders);
    with a ``mesh`` the pool is replicated and every yielded batch is laid
    out batch-sharded across the mesh, so the jitted train step consumes it
    with no resharding.
    """

    def __init__(self, pool: np.ndarray, batch_size: int, seed: int = 0,
                 mesh=None):
        self.batch_size = batch_size
        self.seed = seed
        self.epoch = 0
        self._n = pool.shape[0]
        out_shardings = None
        if mesh is not None:
            from real_esrgan_tpu.parallel import (
                batch_sharding, replicated_sharding,
            )

            self._pool = jax.device_put(pool, replicated_sharding(mesh))
            out_shardings = batch_sharding(mesh)
        else:
            self._pool = jax.device_put(pool)
        self._gather = jax.jit(lambda p, idx: p[idx],
                               out_shardings=out_shardings)

    def __len__(self):
        return self._n // self.batch_size

    def __iter__(self) -> Iterator[jax.Array]:
        order = np.random.default_rng(self.seed + self.epoch).permutation(self._n)
        self.epoch += 1
        for start in range(0, len(self) * self.batch_size, self.batch_size):
            idx = order[start:start + self.batch_size].astype(np.int32)
            yield self._gather(self._pool, idx)
