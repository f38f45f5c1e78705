"""Noise statistics tests and DiffJPEG vs real libjpeg (cv2)."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from real_esrgan_tpu.ops.diffjpeg import diff_jpeg, quality_to_factor
from real_esrgan_tpu.ops.noise import (
    _unique_levels, _vals_from_unique, gaussian_noise, poisson_noise,
    random_add_gaussian_noise, random_add_poisson_noise,
)

RNG = np.random.default_rng(2)


def test_unique_levels_counts():
    img = np.zeros((1, 8, 8, 3), np.float32)
    img[0, 0, 0, 0] = 10 / 255.0
    img[0, 1, 1, 1] = 100 / 255.0
    u = np.array(_unique_levels(jnp.asarray(img)))
    assert u[0] == 3  # {0, 10, 100}
    np.testing.assert_allclose(np.array(_vals_from_unique(jnp.asarray([3]))), [4.0])
    np.testing.assert_allclose(np.array(_vals_from_unique(jnp.asarray([256]))), [256.0])


def test_gaussian_noise_stats():
    img = jnp.full((2, 64, 64, 3), 0.5, jnp.float32)
    sigma = jnp.asarray([10.0, 30.0])
    noise = np.array(gaussian_noise(jax.random.PRNGKey(0), img, sigma,
                                    jnp.zeros(2)))
    np.testing.assert_allclose(noise.std(axis=(1, 2, 3)),
                               [10 / 255, 30 / 255], rtol=0.05)
    np.testing.assert_allclose(noise.mean(), 0.0, atol=2e-3)


def test_gaussian_gray_noise_is_channelwise_equal():
    img = jnp.full((1, 32, 32, 3), 0.5, jnp.float32)
    noise = np.array(gaussian_noise(jax.random.PRNGKey(1), img,
                                    jnp.asarray([20.0]), jnp.ones(1)))
    np.testing.assert_allclose(noise[..., 0], noise[..., 1], atol=1e-7)
    np.testing.assert_allclose(noise[..., 0], noise[..., 2], atol=1e-7)


def test_poisson_noise_scales_with_brightness():
    """Shot noise variance should be proportional to intensity."""
    img = np.full((1, 128, 128, 3), 0.25, np.float32)
    img2 = np.full((1, 128, 128, 3), 0.75, np.float32)
    n1 = np.array(poisson_noise(jax.random.PRNGKey(2), jnp.asarray(img),
                                jnp.ones(1), jnp.zeros(1)))
    n2 = np.array(poisson_noise(jax.random.PRNGKey(3), jnp.asarray(img2),
                                jnp.ones(1), jnp.zeros(1)))
    assert n2.var() > 1.5 * n1.var()
    np.testing.assert_allclose(n1.mean(), 0.0, atol=5e-3)


def test_random_add_noise_clips():
    img = jnp.asarray(RNG.random((2, 16, 16, 3)).astype(np.float32))
    out = np.array(random_add_gaussian_noise(jax.random.PRNGKey(4), img,
                                             (1.0, 30.0), 0.4))
    assert out.min() >= 0.0 and out.max() <= 1.0
    out = np.array(random_add_poisson_noise(jax.random.PRNGKey(5), img,
                                            (0.05, 3.0), 0.4))
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_quality_to_factor():
    np.testing.assert_allclose(np.array(quality_to_factor(jnp.asarray(10.0))), 5.0)
    np.testing.assert_allclose(np.array(quality_to_factor(jnp.asarray(50.0))), 1.0)
    np.testing.assert_allclose(np.array(quality_to_factor(jnp.asarray(90.0))), 0.2)


def _psnr(a, b):
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def test_diffjpeg_close_to_libjpeg():
    """DiffJPEG omits entropy coding (lossless) so the quantization-induced
    distortion should closely track a real JPEG codec at the same quality."""
    img = (RNG.random((64, 64, 3)) * 0.8 + 0.1).astype(np.float32)
    # smooth the random field so it is compressible like a natural image
    img = cv2.GaussianBlur(img, (7, 7), 2.0)
    for q in (30, 60, 90):
        ours = np.array(diff_jpeg(jnp.asarray(img[None]), jnp.asarray(float(q))))[0]
        bgr = (img[..., ::-1] * 255).round().astype(np.uint8)
        ok, enc = cv2.imencode(".jpg", bgr, [int(cv2.IMWRITE_JPEG_QUALITY), q])
        assert ok
        theirs = cv2.imdecode(enc, 1)[..., ::-1].astype(np.float32) / 255.0
        # both codecs should land near each other
        assert _psnr(ours, theirs) > 28, f"q={q}: psnr {_psnr(ours, theirs)}"
        # and both should distort the source by a comparable amount
        d_ours = _psnr(ours, img)
        d_theirs = _psnr(theirs, img)
        assert abs(d_ours - d_theirs) < 6, (q, d_ours, d_theirs)


def test_diffjpeg_nonmultiple_of_16_shapes():
    img = jnp.asarray(RNG.random((2, 50, 37, 3)).astype(np.float32))
    out = diff_jpeg(img, jnp.asarray([40.0, 90.0]))
    assert out.shape == (2, 50, 37, 3)
    assert np.isfinite(np.array(out)).all()


def test_diffjpeg_per_sample_quality_ordering():
    img = (RNG.random((64, 64, 3)) * 0.8 + 0.1).astype(np.float32)
    img = cv2.GaussianBlur(img, (7, 7), 2.0)
    batch = jnp.asarray(np.stack([img, img]))
    out = np.array(diff_jpeg(batch, jnp.asarray([30.0, 95.0])))
    assert _psnr(out[1], img) > _psnr(out[0], img) + 3


def test_diffjpeg_differentiable_mode_grads():
    img = jnp.asarray(RNG.random((1, 16, 16, 3)).astype(np.float32))

    def loss(x):
        return jnp.mean(diff_jpeg(x, 50.0, differentiable=True) ** 2)

    g = jax.grad(loss)(img)
    assert np.isfinite(np.array(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_diffjpeg_quality_100_no_nan():
    """Regression: factor(q=100) was 0 -> division by zero -> NaN output."""
    img = (RNG.random((32, 32, 3)) * 0.8 + 0.1).astype(np.float32)
    img = cv2.GaussianBlur(img, (7, 7), 2.0)  # smooth: 4:2:0 chroma loss small
    out100 = np.array(diff_jpeg(jnp.asarray(img[None]), 100.0))
    out30 = np.array(diff_jpeg(jnp.asarray(img[None]), 30.0))
    assert np.isfinite(out100).all()
    assert _psnr(out100[0], img) > _psnr(out30[0], img) + 3
    assert _psnr(out100[0], img) > 30


def test_poisson_approx_matches_moments():
    """The Cornish-Fisher skew-corrected approximation (the default sampler)
    must match exact Poisson noise in mean, variance AND skewness."""

    def skew(x):
        x = x - x.mean()
        return (x ** 3).mean() / (x ** 2).mean() ** 1.5

    # realistic content: many distinct levels -> vals=256, rates ~ O(100)
    img = (RNG.random((1, 128, 128, 3)) * 0.8 + 0.1).astype(np.float32)
    n_exact = np.array(poisson_noise(jax.random.PRNGKey(7), jnp.asarray(img),
                                     jnp.ones(1), jnp.zeros(1), approx=False))
    n_approx = np.array(poisson_noise(jax.random.PRNGKey(8), jnp.asarray(img),
                                      jnp.ones(1), jnp.zeros(1), approx=True))
    np.testing.assert_allclose(n_exact.mean(), n_approx.mean(), atol=2e-3)
    np.testing.assert_allclose(n_exact.std(), n_approx.std(), rtol=0.05)
    np.testing.assert_allclose(skew(n_exact), skew(n_approx), atol=0.03)

    # dark image: small rates are where approximations diverge — the CF
    # correction keeps the whole distribution close (KS <= ~0.03 at lam=0.25)
    dark = np.full((1, 192, 192, 3), 8 / 255.0, np.float32)  # lam ~ 8
    e = np.array(poisson_noise(jax.random.PRNGKey(9), jnp.asarray(dark),
                               jnp.ones(1), jnp.zeros(1), approx=False))
    a = np.array(poisson_noise(jax.random.PRNGKey(10), jnp.asarray(dark),
                               jnp.ones(1), jnp.zeros(1), approx=True))
    np.testing.assert_allclose(e.std(), a.std(), rtol=0.05)
    np.testing.assert_allclose(skew(e), skew(a), atol=0.08)
    # empirical KS over the discrete noise values
    lo, hi = min(e.min(), a.min()), max(e.max(), a.max())
    grid = np.linspace(lo, hi, 64)
    cdf_e = np.array([(e <= g).mean() for g in grid])
    cdf_a = np.array([(a <= g).mean() for g in grid])
    assert np.max(np.abs(cdf_e - cdf_a)) < 0.05
