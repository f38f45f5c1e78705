"""End-to-end degradation pipeline tests: shapes, value ranges, determinism,
jit-compilability, and plausibility (LR should look like a degraded
downsample of HR, not noise, and not the identity)."""

import jax
import jax.numpy as jnp
import numpy as np

from real_esrgan_tpu.configuration import (
    DegradationConfig, KernelSynthesisConfig, PipelineGeometry,
)
from real_esrgan_tpu.ops.degradation import degrade
from real_esrgan_tpu.ops.resize import matlab_resize

GEO = PipelineGeometry(hr_size=128, crop_size=64, scale=4)
KCFG = KernelSynthesisConfig()
DCFG = DegradationConfig(usm_radius=25)


def _toy_batch(b=4, size=128):
    """Smooth structured images (gradients + circles)."""
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:size, 0:size] / size
    imgs = []
    for i in range(b):
        base = np.stack([
            0.5 + 0.4 * np.sin(6.28 * (xx * (i + 1) + yy)),
            yy, xx * 0.8 + 0.1], axis=-1)
        imgs.append(base + rng.normal(0, 0.02, base.shape))
    return np.clip(np.stack(imgs), 0, 1).astype(np.float32)


def test_degrade_shapes_ranges_finiteness():
    hr = jnp.asarray((_toy_batch() * 255).astype(np.uint8))
    fn = jax.jit(lambda k, x: degrade(k, x, GEO, KCFG, DCFG))
    lr, hr_c = fn(jax.random.PRNGKey(0), hr)
    lr, hr_c = np.array(lr), np.array(hr_c)
    assert lr.shape == (4, 16, 16, 3)
    assert hr_c.shape == (4, 64, 64, 3)
    assert np.isfinite(lr).all() and np.isfinite(hr_c).all()
    assert lr.min() >= 0 and lr.max() <= 1
    # quantized to 8-bit levels
    np.testing.assert_allclose(lr * 255, np.round(lr * 255), atol=1e-4)


def test_degrade_deterministic_per_key():
    hr = jnp.asarray((_toy_batch() * 255).astype(np.uint8))
    fn = jax.jit(lambda k, x: degrade(k, x, GEO, KCFG, DCFG))
    lr1, hr1 = fn(jax.random.PRNGKey(7), hr)
    lr2, hr2 = fn(jax.random.PRNGKey(7), hr)
    np.testing.assert_array_equal(np.array(lr1), np.array(lr2))
    lr3, _ = fn(jax.random.PRNGKey(8), hr)
    assert not np.allclose(np.array(lr1), np.array(lr3))


def test_degrade_is_plausible_downsample():
    """LR should correlate with the bicubic-downsampled HR far better than
    with a shuffled control, across many keys."""
    hr = _toy_batch(b=2)
    hr_u8 = jnp.asarray((hr * 255).astype(np.uint8))
    geo = PipelineGeometry(hr_size=128, crop_size=128, scale=4)  # full crop
    fn = jax.jit(lambda k, x: degrade(k, x, geo, KCFG, DCFG, augment=False))
    corrs = []
    for seed in range(4):
        lr, hr_c = fn(jax.random.PRNGKey(seed), hr_u8)
        lr = np.array(lr)
        ref = np.array(matlab_resize(jnp.asarray(np.array(hr_c)), 0.25))
        for i in range(lr.shape[0]):
            a, b = lr[i].ravel(), ref[i].ravel()
            corrs.append(np.corrcoef(a, b)[0, 1])
    corrs = np.array(corrs)
    assert corrs.mean() > 0.7, corrs
    # degradation must actually degrade: some pairs differ notably
    assert corrs.min() < 0.999


def test_degrade_no_augment_keeps_orientation():
    hr = _toy_batch(b=1)
    hr_u8 = jnp.asarray((hr * 255).astype(np.uint8))
    geo = PipelineGeometry(hr_size=128, crop_size=128, scale=4)
    _, hr_c = jax.jit(lambda k, x: degrade(k, x, geo, KCFG, DCFG, augment=False))(
        jax.random.PRNGKey(0), hr_u8)
    np.testing.assert_allclose(np.array(hr_c), hr, atol=1.0 / 255.0 + 1e-6)
