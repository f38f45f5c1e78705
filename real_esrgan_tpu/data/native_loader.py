"""ctypes bindings for the native C++ decode+crop loader (native/loader.cpp).

Builds the shared library on first use (g++ + system libpng/libjpeg) and
exposes ``NativeBatchLoader``, a drop-in producer of uint8 HR crop batches.
Falls back gracefully: ``available()`` returns False when the toolchain or
libraries are missing and callers use the Python ThreadedLoader instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "_native_loader.so")

_lib = None
_lib_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def _load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH) and not _build():
            return None
        lib = ctypes.CDLL(_SO_PATH)
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [ctypes.c_int]
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        lib.loader_decode_crop_batch.restype = ctypes.c_int
        lib.loader_decode_crop_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.c_int, ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint8)]
        lib.loader_set_cache_budget.argtypes = [ctypes.c_void_p,
                                                ctypes.c_uint64]
        lib.loader_cache_stats.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint64)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class NativeBatchLoader:
    """Decode n image files and random-crop into one uint8 batch, in C++."""

    def __init__(self, num_threads: int = 8, cache_bytes: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable (build failed)")
        self._lib = lib
        self._pool = lib.loader_create(num_threads)
        if cache_bytes > 0:
            lib.loader_set_cache_budget(self._pool,
                                        ctypes.c_uint64(cache_bytes))

    def __del__(self):
        if getattr(self, "_pool", None):
            self._lib.loader_destroy(self._pool)
            self._pool = None

    def decode_crop_batch(self, paths: List[str], crop: int,
                          seed: int) -> np.ndarray:
        n = len(paths)
        out = np.empty((n, crop, crop, 3), np.uint8)
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        rc = self._lib.loader_decode_crop_batch(
            self._pool, c_paths, n, crop, ctypes.c_uint64(seed),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc != 0:
            raise IOError(f"native decode failed for {paths[-rc - 1]}")
        return out

    def cache_stats(self):
        entries = ctypes.c_uint64(0)
        used = ctypes.c_uint64(0)
        self._lib.loader_cache_stats(self._pool, ctypes.byref(entries),
                                     ctypes.byref(used))
        return int(entries.value), int(used.value)


class NativeThreadedLoader:
    """Epoch iterator over HR files using the C++ pool (drop-in for
    ThreadedLoader when all decoding should bypass Python)."""

    def __init__(self, files: List[str], batch_size: int, crop: int,
                 num_threads: int = 8, seed: int = 0, prefetch: int = 2,
                 shard_id: int = 0, num_shards: int = 1,
                 cache_bytes: int = 0):
        self.files = list(files)
        self.batch_size = batch_size
        self.crop = crop
        self.seed = seed
        self.prefetch = prefetch
        self.shard_id = shard_id
        self.num_shards = max(1, num_shards)
        self.epoch = 0
        self._native = NativeBatchLoader(num_threads, cache_bytes=cache_bytes)

    def __len__(self):
        return (len(self.files) // self.num_shards) // self.batch_size

    def __iter__(self):
        import queue

        n = len(self.files)
        # same seeded shuffle on every host; disjoint equal-length strides
        # (see ThreadedLoader) keep multi-host step counts in lockstep
        full_order = np.random.default_rng(self.seed + self.epoch).permutation(n)
        self.epoch += 1
        usable = ((n // self.num_shards) // self.batch_size) * self.batch_size
        order = full_order[self.shard_id::self.num_shards][:usable]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                for i in range(0, usable, self.batch_size):
                    paths = [self.files[j] for j in order[i:i + self.batch_size]]
                    q.put(self._native.decode_crop_batch(
                        paths, self.crop, self.seed * 1_000_003 + self.epoch * 97 + i))
            except Exception as exc:
                q.put(exc)
            q.put(sentinel)

        threading.Thread(target=producer, daemon=True).start()
        while True:
            item = q.get()
            if item is sentinel:
                return
            if isinstance(item, Exception):
                raise item
            yield item
