"""Asynchronous host->device batch prefetcher.

The TPU analogue of the reference's ``CUDAPrefetcher`` side-stream copies
(/root/reference/dataset.py:271-312): while the jitted step consumes batch N
(JAX dispatch is already async), batch N+1 is decoded and transferred by a
background thread, so the device never waits on PCIe/host decode.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator, Optional

import jax


class CPUPrefetcher:
    """Trivial iterator wrapper (API parity with the reference's
    CPUPrefetcher, /root/reference/dataset.py:246-268)."""

    def __init__(self, iterable: Iterable):
        self.iterable = iterable
        self._it = iter(iterable)

    def __len__(self):
        return len(self.iterable)

    def next(self):
        try:
            return next(self._it)
        except StopIteration:
            return None

    def reset(self):
        self._it = iter(self.iterable)


class DevicePrefetcher:
    def __init__(self, iterable: Iterable, buffer_size: int = 2,
                 sharding: Optional[Any] = None):
        self.iterable = iterable
        self.buffer_size = buffer_size
        self.sharding = sharding

    def __len__(self):
        return len(self.iterable)

    def _put(self, batch):
        if isinstance(batch, jax.Array):
            return batch  # already device-resident (DevicePoolLoader)
        if self.sharding is not None:
            if jax.process_count() > 1:
                # multi-host: this host holds only its shard of the global
                # batch; assemble the global sharded array from local data
                return jax.make_array_from_process_local_data(
                    self.sharding, batch)
            return jax.device_put(batch, self.sharding)
        return jax.device_put(batch)

    def __iter__(self) -> Iterator:
        q: "queue.Queue" = queue.Queue(maxsize=self.buffer_size)
        sentinel = object()

        def producer():
            try:
                for batch in self.iterable:
                    q.put(self._put(batch))
            except Exception as exc:
                q.put(exc)
            q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                return
            if isinstance(item, Exception):
                raise item
            yield item
