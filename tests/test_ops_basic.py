"""Unit tests for color / filter2d / usm / augment ops against independent
trusted implementations (cv2, scipy, torch CPU) — never against reference code.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from real_esrgan_tpu.ops import (
    apply_orientation, bgr2ycbcr, center_crop, filter2d, gaussian_kernel_1d,
    paired_random_crop, random_orientation, rgb2ycbcr, rgb_to_grayscale,
    usm_sharpen, ycbcr2bgr, ycbcr2rgb,
)
from real_esrgan_tpu.ops.filter2d import filter2d_separable

RNG = np.random.default_rng(0)


def test_rgb2ycbcr_matches_matlab_coeffs():
    img = RNG.random((5, 6, 3)).astype(np.float32)
    y = np.array(rgb2ycbcr(jnp.asarray(img), only_y=True))[..., 0]
    expected = (img @ np.array([65.481, 128.553, 24.966]) + 16.0) / 255.0
    np.testing.assert_allclose(y, expected, atol=1e-5)


def test_bgr_rgb_consistency():
    img = RNG.random((4, 4, 3)).astype(np.float32)
    a = np.array(bgr2ycbcr(jnp.asarray(img[..., ::-1].copy())))
    b = np.array(rgb2ycbcr(jnp.asarray(img)))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_ycbcr_roundtrip():
    img = RNG.random((8, 8, 3)).astype(np.float32) * 0.8 + 0.1
    ycc = rgb2ycbcr(jnp.asarray(img))
    back = np.array(ycbcr2rgb(ycc))
    np.testing.assert_allclose(back, img, atol=2e-3)


def test_grayscale_matches_itu():
    img = RNG.random((2, 5, 5, 3)).astype(np.float32)
    g = np.array(rgb_to_grayscale(jnp.asarray(img)))
    exp = img @ np.array([0.299, 0.587, 0.114], np.float32)
    np.testing.assert_allclose(g[..., 0], exp, atol=1e-6)


def test_filter2d_matches_cv2():
    img = RNG.random((11, 13, 3)).astype(np.float32)
    kern = RNG.random((5, 5)).astype(np.float32)
    kern /= kern.sum()
    out = np.array(filter2d(jnp.asarray(img[None]), jnp.asarray(kern)))[0]
    exp = cv2.filter2D(img, -1, kern, borderType=cv2.BORDER_REFLECT_101)
    np.testing.assert_allclose(out, exp, atol=1e-5)


def test_filter2d_per_sample_kernels():
    imgs = RNG.random((3, 9, 9, 2)).astype(np.float32)
    kerns = RNG.random((3, 3, 3)).astype(np.float32)
    out = np.array(filter2d(jnp.asarray(imgs), jnp.asarray(kerns)))
    for i in range(3):
        one = np.array(filter2d(jnp.asarray(imgs[i:i + 1]), jnp.asarray(kerns[i])))
        np.testing.assert_allclose(out[i], one[0], atol=1e-5)


def test_separable_equals_dense_outer_product():
    img = RNG.random((2, 16, 16, 3)).astype(np.float32)
    k1d = gaussian_kernel_1d(9, 1.5)
    k2d = np.outer(k1d, k1d)
    a = np.array(filter2d_separable(jnp.asarray(img), jnp.asarray(k1d)))
    b = np.array(filter2d(jnp.asarray(img), jnp.asarray(k2d)))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_gaussian_kernel_matches_cv2():
    for ksize, sigma in [(51, 0.0), (9, 1.5), (21, 3.0)]:
        ours = gaussian_kernel_1d(ksize, sigma)
        theirs = cv2.getGaussianKernel(ksize if ksize % 2 else ksize + 1, sigma)[:, 0]
        np.testing.assert_allclose(ours, theirs.astype(np.float32), atol=1e-6)


def test_usm_matches_cv2_reference_math():
    """USM vs an independent numpy realization of unsharp masking."""
    img = RNG.random((20, 20, 3)).astype(np.float32)
    k1d = gaussian_kernel_1d(51, 0.0)
    out = np.array(usm_sharpen(jnp.asarray(img[None]), jnp.asarray(k1d), 0.5, 10.0))[0]

    blur = cv2.sepFilter2D(img, -1, k1d, k1d, borderType=cv2.BORDER_REFLECT_101)
    residual = img - blur
    mask = (np.abs(residual) * 255 > 10).astype(np.float32)
    soft = cv2.sepFilter2D(mask, -1, k1d, k1d, borderType=cv2.BORDER_REFLECT_101)
    exp = soft * np.clip(img + 0.5 * residual, 0, 1) + (1 - soft) * img
    np.testing.assert_allclose(out, exp, atol=1e-4)


def test_center_crop():
    img = jnp.arange(100, dtype=jnp.float32).reshape(10, 10, 1)
    out = center_crop(img, 4)
    assert out.shape == (4, 4, 1)
    assert float(out[0, 0, 0]) == 33.0


def test_orientation_is_bijection():
    key = jax.random.PRNGKey(0)
    img = jnp.asarray(RNG.random((8, 8, 3)).astype(np.float32))
    rot, hf, vf = random_orientation(key, 16)
    outs = [np.array(apply_orientation(img, rot[i], hf[i], vf[i])) for i in range(16)]
    for o in outs:
        assert o.shape == img.shape
        np.testing.assert_allclose(np.sort(o.ravel()), np.sort(np.array(img).ravel()),
                                   atol=0)


def test_paired_random_crop_alignment():
    key = jax.random.PRNGKey(1)
    scale = 4
    hr = jnp.asarray(RNG.random((2, 40, 40, 3)).astype(np.float32))
    lr = hr[:, ::scale, ::scale, :]  # trivially aligned stand-in
    lr_p, hr_p = paired_random_crop(key, lr, hr, 16, scale)
    assert lr_p.shape == (2, 4, 4, 3)
    assert hr_p.shape == (2, 16, 16, 3)
    # LR patch pixels must be the subsampled HR patch when top/left % scale == 0
    # (positions are multiples only sometimes; verify the coordinate relation
    # via a searchable unique marker instead)
    hr2 = np.zeros((1, 40, 40, 1), np.float32)
    hr2[0, 20, 24, 0] = 1.0
    lr2 = hr2[:, ::scale, ::scale, :]
    lr_p2, hr_p2 = paired_random_crop(key, jnp.asarray(lr2), jnp.asarray(hr2), 16, scale)
    if hr_p2.sum() > 0:  # marker inside HR crop
        hy, hx = np.argwhere(np.array(hr_p2)[0, ..., 0])[0]
        assert np.array(lr_p2).sum() > 0
