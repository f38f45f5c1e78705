"""Host data pipeline tests: datasets, threaded loader, prefetchers."""

import os

import cv2
import jax
import numpy as np

from real_esrgan_tpu.data import (
    CPUPrefetcher, DevicePrefetcher, TestImageDataset, ThreadedLoader,
    TrainImageDataset, ValidImageDataset,
)

DATA = os.path.join(os.path.dirname(__file__), "data")


def _make_dir_of_images(tmp_path, n=6, size=64):
    rng = np.random.default_rng(0)
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(n):
        img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(d / f"im_{i}.png"), img)
    return str(d)


def test_train_dataset_crops(tmp_path):
    d = _make_dir_of_images(tmp_path, size=80)
    ds = TrainImageDataset(d, hr_size=48)
    rng = np.random.default_rng(1)
    crop = ds.load(0, rng)
    assert crop.shape == (48, 48, 3) and crop.dtype == np.uint8


def test_train_dataset_pads_small_images(tmp_path):
    d = _make_dir_of_images(tmp_path, size=30)
    ds = TrainImageDataset(d, hr_size=48)
    crop = ds.load(0, np.random.default_rng(0))
    assert crop.shape == (48, 48, 3)


def test_train_dataset_decoded_cache(tmp_path):
    """cache_bytes keeps decoded images in RAM: same random stream yields
    identical crops cached vs uncached, and the budget is respected."""
    d = _make_dir_of_images(tmp_path, size=80)
    plain = TrainImageDataset(d, hr_size=48)
    cached = TrainImageDataset(d, hr_size=48, cache_bytes=1 << 20)
    for i in range(len(cached)):
        cached.load(i, np.random.default_rng(9))  # warm
    assert len(cached._cache) == len(cached)
    for i in range(len(cached)):
        np.testing.assert_array_equal(
            cached.load(i, np.random.default_rng(i)),
            plain.load(i, np.random.default_rng(i)))

    broke = TrainImageDataset(d, hr_size=48, cache_bytes=10)  # over budget
    broke.load(0, np.random.default_rng(0))
    assert not broke._cache


def test_threaded_loader_batches_and_drop_last(tmp_path):
    d = _make_dir_of_images(tmp_path, n=10, size=64)
    loader = ThreadedLoader(TrainImageDataset(d, 32), batch_size=4,
                            num_workers=2, seed=3)
    batches = list(iter(loader))
    assert len(batches) == 2  # 10 // 4, tail dropped
    for b in batches:
        assert b.shape == (4, 32, 32, 3) and b.dtype == np.uint8
    # next epoch reshuffles
    batches2 = list(iter(loader))
    assert len(batches2) == 2


def test_threaded_loader_deterministic_across_runs(tmp_path):
    """Fixed seed => identical batch composition AND crops, independent of
    thread scheduling (crop RNG keyed by sample index, batches reassembled
    in shuffled order)."""
    d = _make_dir_of_images(tmp_path, n=8, size=64)
    runs = []
    for _ in range(2):
        loader = ThreadedLoader(TrainImageDataset(d, 32), batch_size=4,
                                num_workers=3, seed=7)
        runs.append(list(iter(loader)))
    assert len(runs[0]) == len(runs[1]) == 2
    for a, b in zip(runs[0], runs[1]):
        np.testing.assert_array_equal(a, b)


def test_threaded_loader_multihost_sharding(tmp_path):
    """Shards must be equal-length, lockstep, and jointly cover the shuffle
    (the multi-host data-parallel contract)."""
    d = _make_dir_of_images(tmp_path, n=9, size=48)
    ds = TrainImageDataset(d, 32)
    loaders = [ThreadedLoader(ds, batch_size=2, num_workers=2, seed=5,
                              shard_id=i, num_shards=2) for i in range(2)]
    assert len(loaders[0]) == len(loaders[1]) == 2  # 9//2 = 4 per shard -> 2
    runs = [np.concatenate(list(iter(ld))) for ld in loaders]
    assert runs[0].shape == runs[1].shape == (4, 32, 32, 3)
    # disjoint: no crop from shard 0 appears in shard 1 (crops are keyed by
    # sample index, so identical content would mean overlapping indices)
    flat0 = {a.tobytes() for a in runs[0]}
    flat1 = {a.tobytes() for a in runs[1]}
    assert not flat0 & flat1


def test_valid_dataset_pair_geometry(tmp_path):
    d = _make_dir_of_images(tmp_path, n=2, size=80)
    ds = ValidImageDataset(d, crop_size=64, scale=4)
    s = ds[0]
    assert s["hr"].shape == (64, 64, 3)
    assert s["lr"].shape == (16, 16, 3)
    assert 0.0 <= s["lr"].min() and s["lr"].max() <= 1.0 + 1e-5


def test_test_dataset_pairs(tmp_path):
    (tmp_path / "a").mkdir()
    lr_dir = _make_dir_of_images(tmp_path / "a", n=3, size=16)
    hr_dir = tmp_path / "a" / "hr"
    hr_dir.mkdir()
    for f in os.listdir(lr_dir):
        img = cv2.imread(os.path.join(lr_dir, f))
        cv2.imwrite(str(hr_dir / f), cv2.resize(img, (64, 64)))
    ds = TestImageDataset(lr_dir, str(hr_dir))
    assert len(ds) == 3
    s = ds[1]
    assert s["lr"].shape == (16, 16, 3) and s["hr"].shape == (64, 64, 3)


def test_device_prefetcher_and_cpu_prefetcher(tmp_path):
    d = _make_dir_of_images(tmp_path, n=8, size=40)
    loader = ThreadedLoader(TrainImageDataset(d, 32), batch_size=4,
                            num_workers=2)
    dev = list(DevicePrefetcher(loader))
    assert len(dev) == 2
    assert all(isinstance(b, jax.Array) for b in dev)

    cpu = CPUPrefetcher(loader)
    assert cpu.next() is not None
    cpu.reset()
    count = 0
    while cpu.next() is not None:
        count += 1
    assert count == 2
