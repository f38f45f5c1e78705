"""GrainLoader: deterministic order, disjoint shards, mid-stream resume."""

import numpy as np
import pytest

from real_esrgan_tpu.data import grain_loader

pytestmark = pytest.mark.skipif(not grain_loader.available(),
                                reason="grain not installed")


@pytest.fixture(scope="module")
def image_files(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("grain_imgs")
    rng = np.random.default_rng(3)
    files = []
    for i in range(12):
        img = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
        path = str(root / f"img{i:02d}.png")
        cv2.imwrite(path, img)
        files.append(path)
    return files


def _batches(loader, n_epochs=1):
    out = []
    for _ in range(n_epochs):
        out.extend(b.copy() for b in loader)
    return out


def test_deterministic_and_shaped(image_files):
    mk = lambda: grain_loader.GrainLoader(  # noqa: E731
        image_files, batch=4, hr_size=32, num_workers=0, seed=7)
    a, b = _batches(mk()), _batches(mk())
    assert len(a) == len(mk()) == 3
    for x, y in zip(a, b):
        assert x.shape == (4, 32, 32, 3) and x.dtype == np.uint8
        np.testing.assert_array_equal(x, y)


def test_shards_are_disjoint_and_cover(image_files):
    def keys(shard_id):
        ld = grain_loader.GrainLoader(image_files, batch=2, hr_size=32,
                                      num_workers=0, seed=7,
                                      shard_id=shard_id, num_shards=2)
        return np.concatenate([b.reshape(b.shape[0], -1).sum(1)
                               for b in _batches(ld)])

    k0, k1 = keys(0), keys(1)
    assert len(k0) == len(k1) == 6  # 12 records / 2 shards, batch 2 x 3 steps
    # crops are key-deterministic, so identical sums imply identical records:
    # the two shards must not overlap
    assert not set(k0.tolist()) & set(k1.tolist())


def test_mid_stream_resume(image_files):
    mk = lambda: grain_loader.GrainLoader(  # noqa: E731
        image_files, batch=4, hr_size=32, num_workers=0, seed=11)
    ref = mk()
    ref_batches = _batches(ref, n_epochs=2)

    ld = mk()
    it = iter(ld)
    got = [next(it).copy(), next(it).copy()]
    state = ld.get_state()

    np.testing.assert_array_equal(ref_batches[0], got[0])
    np.testing.assert_array_equal(ref_batches[1], got[1])

    resumed = mk()
    resumed.set_state(state)  # a fresh process continues the global stream
    got_rest = _batches(resumed)
    np.testing.assert_array_equal(ref_batches[2], got_rest[0])
    np.testing.assert_array_equal(ref_batches[3], got_rest[1])


def test_loader_state_file_roundtrip(image_files, tmp_path):
    """save_loader_state/restore_loader_state: the trainer wiring contract."""
    mk = lambda: grain_loader.GrainLoader(  # noqa: E731
        image_files, batch=4, hr_size=32, num_workers=0, seed=13)
    ref_batches = _batches(mk(), n_epochs=2)

    ld = mk()
    _batches(ld)  # consume epoch 1
    grain_loader.save_loader_state(ld, str(tmp_path), epoch=1)

    resumed = mk()  # fresh process, elastic restart at epoch 1
    assert grain_loader.restore_loader_state(resumed, str(tmp_path), 1)
    got = _batches(resumed)
    for want, have in zip(ref_batches[3:], got):
        np.testing.assert_array_equal(want, have)


def test_loader_state_epoch_mismatch_and_stateless(image_files, tmp_path):
    mk = lambda: grain_loader.GrainLoader(  # noqa: E731
        image_files, batch=4, hr_size=32, num_workers=0, seed=13)
    ld = mk()
    grain_loader.save_loader_state(ld, str(tmp_path), epoch=5)
    # epoch tag mismatch -> refuse (stream restarts, pre-wiring behavior)
    assert not grain_loader.restore_loader_state(mk(), str(tmp_path), 4)
    # stateless loaders are a silent no-op on both sides
    grain_loader.save_loader_state(object(), str(tmp_path), epoch=1)
    assert not grain_loader.restore_loader_state(object(), str(tmp_path), 1)
    # missing file -> False
    assert not grain_loader.restore_loader_state(mk(), str(tmp_path / "x"), 1)
