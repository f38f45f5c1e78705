"""Native C++ loader tests: availability, pixel-exactness vs cv2, batch
iteration, and error surfacing."""

import os

import cv2
import numpy as np
import pytest

from real_esrgan_tpu.data.native_loader import (
    NativeBatchLoader, NativeThreadedLoader, available,
)

DATA = os.path.join(os.path.dirname(__file__), "data")
PNGS = [os.path.join(DATA, "tree_lr.png"), os.path.join(DATA, "tree_sr.png")]

pytestmark = pytest.mark.skipif(not available(),
                                reason="native loader toolchain unavailable")


def test_decode_matches_cv2_full_image(tmp_path):
    # square image + crop == size -> whole image, no randomness
    ref = cv2.cvtColor(cv2.imread(PNGS[0]), cv2.COLOR_BGR2RGB)[:256, :256]
    p = str(tmp_path / "sq.png")
    cv2.imwrite(p, cv2.cvtColor(ref, cv2.COLOR_RGB2BGR))
    nl = NativeBatchLoader(2)
    out = nl.decode_crop_batch([p], 256, seed=0)[0]
    np.testing.assert_array_equal(out, ref)


def test_batch_iteration_shapes_and_determinism():
    files = PNGS * 4
    l1 = NativeThreadedLoader(files, batch_size=4, crop=64, seed=5)
    batches1 = list(iter(l1))
    assert len(batches1) == 2
    assert all(b.shape == (4, 64, 64, 3) and b.dtype == np.uint8 for b in batches1)
    l2 = NativeThreadedLoader(files, batch_size=4, crop=64, seed=5)
    batches2 = list(iter(l2))
    for a, b in zip(batches1, batches2):
        np.testing.assert_array_equal(a, b)


def test_decoded_cache_hits_and_budget(tmp_path):
    """Cached decode returns identical crops; budget 0 caches nothing; a
    cached re-read matches a fresh decode byte-for-byte."""
    ref = cv2.cvtColor(cv2.imread(PNGS[0]), cv2.COLOR_BGR2RGB)[:128, :128]
    p = str(tmp_path / "c.png")
    cv2.imwrite(p, cv2.cvtColor(ref, cv2.COLOR_RGB2BGR))

    cold = NativeBatchLoader(2)                       # budget 0: no caching
    cold.decode_crop_batch([p], 128, seed=0)
    assert cold.cache_stats() == (0, 0)

    warm = NativeBatchLoader(2, cache_bytes=1 << 20)
    first = warm.decode_crop_batch([p, p], 128, seed=0)
    entries, used = warm.cache_stats()
    assert entries == 1 and 128 * 128 * 3 <= used < 1 << 20
    second = warm.decode_crop_batch([p, p], 128, seed=0)  # served from cache
    np.testing.assert_array_equal(first, second)
    np.testing.assert_array_equal(second[0], ref)

    tiny = NativeBatchLoader(2, cache_bytes=100)      # over budget: skip
    tiny.decode_crop_batch([p], 128, seed=0)
    assert tiny.cache_stats() == (0, 0)


def test_missing_file_raises():
    nl = NativeBatchLoader(2)
    with pytest.raises(IOError):
        nl.decode_crop_batch(["/no/such/image.png"], 32, seed=0)


def test_reflect_pad_small_image(tmp_path):
    small = (np.arange(10 * 8 * 3) % 255).astype(np.uint8).reshape(10, 8, 3)
    p = str(tmp_path / "small.png")
    cv2.imwrite(p, cv2.cvtColor(small, cv2.COLOR_RGB2BGR))
    nl = NativeBatchLoader(1)
    out = nl.decode_crop_batch([p], 16, seed=1)[0]
    assert out.shape == (16, 16, 3)
    # top-left region must be the original image
    np.testing.assert_array_equal(out[:10, :8], small)
