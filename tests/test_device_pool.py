"""Device-resident pool loader (data/device_pool.py).

The pool replaces the reference's per-step decode+transfer pipeline
(/root/reference/dataset.py:117-160 + CUDAPrefetcher) with one HBM upload
and on-device index gathers; these tests pin its sampling semantics
(epoch-seeded shuffle, dropped tail), the mesh layout of the yielded
batches, and the auto-selection / fallback gates in make_train_loader.
"""

import jax
import numpy as np
import pytest

from real_esrgan_tpu.data import DevicePoolLoader, build_pool_array
from real_esrgan_tpu.data.prefetcher import DevicePrefetcher
from real_esrgan_tpu.parallel import batch_sharding, make_mesh


class _FixedDataset:
    def __init__(self, n, size=16, jitter=()):
        self.n, self.size = n, size
        self.jitter = set(jitter)  # indices decoded larger than `size`

    def __len__(self):
        return self.n

    def _decode(self, i):
        s = self.size + (4 if i in self.jitter else 0)
        return np.full((s, s, 3), i, np.uint8)

    def load(self, i, rng):
        img = self._decode(i)
        return img[:self.size, :self.size]


def test_build_pool_array_stacks_every_image():
    pool = build_pool_array(_FixedDataset(10), 16, budget_bytes=1 << 30)
    assert pool.shape == (10, 16, 16, 3) and pool.dtype == np.uint8
    assert [int(pool[i, 0, 0, 0]) for i in range(10)] == list(range(10))


def test_build_pool_array_refuses_over_budget_and_ragged():
    ds = _FixedDataset(10)
    assert build_pool_array(ds, 16, budget_bytes=100) is None
    # an image larger than hr_size means the host loader's per-epoch random
    # crop is load-bearing: the pool must refuse rather than freeze one crop
    assert build_pool_array(_FixedDataset(10, jitter=(3,)), 16,
                            budget_bytes=1 << 30) is None


def test_loader_epoch_semantics_match_threaded_loader():
    pool = build_pool_array(_FixedDataset(10), 16, budget_bytes=1 << 30)
    loader = DevicePoolLoader(pool, batch_size=4, seed=7)
    assert len(loader) == 2  # ragged tail dropped (10 // 4)
    e0 = [np.asarray(b)[:, 0, 0, 0] for b in loader]
    e1 = [np.asarray(b)[:, 0, 0, 0] for b in loader]
    e0_again = [np.asarray(b)[:, 0, 0, 0]
                for b in DevicePoolLoader(pool, batch_size=4, seed=7)]
    assert all(isinstance(b, jax.Array) for b in DevicePoolLoader(pool, 4))
    # epoch 0 is reproducible across loader instances; epoch 1 reshuffles
    np.testing.assert_array_equal(np.concatenate(e0), np.concatenate(e0_again))
    assert not np.array_equal(np.concatenate(e0), np.concatenate(e1))
    flat0 = np.concatenate(e0)
    assert len(set(flat0.tolist())) == len(flat0)  # no repeats in an epoch


def test_loader_lays_batches_out_batch_sharded_over_the_mesh():
    mesh = make_mesh()
    pool = build_pool_array(_FixedDataset(16), 16, budget_bytes=1 << 30)
    loader = DevicePoolLoader(pool, batch_size=8, seed=0, mesh=mesh)
    batch = next(iter(loader))
    assert batch.sharding.is_equivalent_to(batch_sharding(mesh), batch.ndim)
    # the prefetcher must pass device-resident batches through untouched
    # (a re-put would pay the relay transfer the pool exists to avoid)
    pf = DevicePrefetcher(loader, sharding=batch_sharding(mesh))
    first = next(iter(pf))
    assert isinstance(first, jax.Array)


def test_make_train_loader_auto_selects_and_falls_back():
    import config as run_config
    from train_realesrnet import SyntheticHRDataset, make_train_loader

    geo = run_config.geometry
    cfg = run_config.train_esrnet
    ds = SyntheticHRDataset(geo.hr_size, length=8)
    loader = make_train_loader(ds, 4, cfg, geo, mesh=make_mesh(),
                               sharded=False)
    assert isinstance(loader, DevicePoolLoader)
    # zero budget disables the pool: auto falls through to a host loader
    import dataclasses
    cfg0 = dataclasses.replace(cfg, device_pool_budget_bytes=0)
    host = make_train_loader(ds, 4, cfg0, geo, sharded=False)
    assert not isinstance(host, DevicePoolLoader)
    cfgd = dataclasses.replace(cfg, loader="device",
                               device_pool_budget_bytes=64)
    with pytest.raises(ValueError):
        make_train_loader(ds, 4, cfgd, geo, sharded=False)
