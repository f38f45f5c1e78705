"""Host-side numpy twins must agree with the on-device batched pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from real_esrgan_tpu.ops.filter2d import filter2d
from real_esrgan_tpu.ops.host import (
    add_gaussian_noise_np, add_poisson_noise_np, filter2d_np,
    sample_blur_kernel_np, usm_sharpen_np,
)
from real_esrgan_tpu.ops.usm import gaussian_kernel_1d, usm_sharpen

RNG = np.random.default_rng(11)


def test_usm_np_matches_device():
    img = RNG.random((40, 40, 3)).astype(np.float32)
    a = usm_sharpen_np(img, ksize=13)
    b = np.asarray(usm_sharpen(jnp.asarray(img[None]),
                               gaussian_kernel_1d(13, 0.0)))[0]
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_filter2d_np_matches_device():
    img = RNG.random((32, 32, 3)).astype(np.float32)
    k = sample_blur_kernel_np(3)
    a = filter2d_np(img, k)
    b = np.asarray(filter2d(jnp.asarray(img[None]), jnp.asarray(k)))[0]
    np.testing.assert_allclose(a, b, atol=2e-5)
    np.testing.assert_allclose(k.sum(), 1.0, atol=1e-5)
    assert k.shape == (21, 21)


def test_noise_np_statistics():
    img = np.full((64, 64, 3), 0.5, np.float32)
    g = add_gaussian_noise_np(img, sigma=20.0, rng=np.random.default_rng(0),
                              clip=False)
    np.testing.assert_allclose((g - img).std(), 20.0 / 255.0, rtol=0.05)
    gray = add_gaussian_noise_np(img, 20.0, gray_noise=True,
                                 rng=np.random.default_rng(1), clip=False)
    np.testing.assert_allclose(gray[..., 0], gray[..., 1], atol=1e-7)

    rich = (RNG.random((64, 64, 3)) * 0.8 + 0.1).astype(np.float32)
    p = add_poisson_noise_np(rich, scale=1.0, rng=np.random.default_rng(2),
                             clip=False)
    noise = p - rich
    assert 0.01 < noise.std() < 0.2
    np.testing.assert_allclose(noise.mean(), 0.0, atol=5e-3)
