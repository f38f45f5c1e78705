"""Blur-kernel synthesis tests: Bessel J1 vs scipy, kernel forms vs an
independent numpy evaluation, masked-grid == generate-then-pad equivalence,
and sampler distribution sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.special

from real_esrgan_tpu.configuration import KernelSynthesisConfig
from real_esrgan_tpu.ops.blur_kernels import (
    bessel_j1, bivariate_kernel_grid, identity_kernel,
    random_final_sinc_kernel, random_first_order_kernel,
    random_mixed_kernel, random_second_order_kernel, sinc_kernel_grid,
)

CFG = KernelSynthesisConfig()


def test_bessel_j1_matches_scipy():
    x = np.linspace(-40, 40, 4001).astype(np.float64)
    ours = np.array(bessel_j1(jnp.asarray(x)))
    theirs = scipy.special.j1(x)
    np.testing.assert_allclose(ours, theirs, atol=4e-6)


def _numpy_bivariate(pad_to, ksize, sx, sy, theta, beta, form):
    """Independent numpy evaluation of the masked kernel forms."""
    ax = np.arange(pad_to) - (pad_to - 1) / 2
    xx, yy = np.meshgrid(ax, ax)
    d = np.array([[sx ** 2, 0], [0, sy ** 2]])
    u = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    sigma = u @ d @ u.T
    inv = np.linalg.inv(sigma)
    q = inv[0, 0] * xx ** 2 + 2 * inv[0, 1] * xx * yy + inv[1, 1] * yy ** 2
    if form == 0:
        k = np.exp(-0.5 * q)
    elif form == 1:
        k = np.exp(-0.5 * np.power(q, beta))
    else:
        k = 1.0 / (np.power(q, beta) + 1.0)
    half = (ksize - 1) / 2
    mask = (np.abs(xx) <= half) & (np.abs(yy) <= half)
    k = k * mask
    return k / k.sum()


def test_bivariate_forms_match_numpy():
    for form in (0, 1, 2):
        for ksize in (7, 13, 21):
            ours = np.array(bivariate_kernel_grid(
                21, jnp.int32(ksize), jnp.float32(1.7), jnp.float32(0.9),
                jnp.float32(0.6), jnp.float32(1.5), jnp.int32(form)))
            exp = _numpy_bivariate(21, ksize, 1.7, 0.9, 0.6, 1.5, form)
            np.testing.assert_allclose(ours, exp, atol=1e-5)


def test_sinc_kernel_matches_direct_formula():
    for ksize in (7, 15, 21):
        cutoff = 1.9
        ours = np.array(sinc_kernel_grid(21, jnp.int32(ksize), jnp.float32(cutoff)))
        # independent: evaluate on the KxK grid then zero-pad to 21
        with np.errstate(divide="ignore", invalid="ignore"):
            k = np.fromfunction(
                lambda x, y: cutoff * scipy.special.j1(
                    cutoff * np.sqrt((x - (ksize - 1) / 2) ** 2 + (y - (ksize - 1) / 2) ** 2))
                / (2 * np.pi * np.sqrt((x - (ksize - 1) / 2) ** 2 + (y - (ksize - 1) / 2) ** 2)),
                [ksize, ksize])
        k[(ksize - 1) // 2, (ksize - 1) // 2] = cutoff ** 2 / (4 * np.pi)
        k = k / k.sum()
        pad = (21 - ksize) // 2
        k = np.pad(k, pad)
        np.testing.assert_allclose(ours, k, atol=1e-6)


def test_kernels_normalized_and_centered():
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    k1 = jax.vmap(lambda k: random_first_order_kernel(k, CFG))(keys)
    k2 = jax.vmap(lambda k: random_second_order_kernel(k, CFG))(keys)
    ks = jax.vmap(lambda k: random_final_sinc_kernel(k, CFG))(keys)
    for arr in (np.array(k1), np.array(k2), np.array(ks)):
        assert arr.shape == (64, 21, 21)
        np.testing.assert_allclose(arr.sum(axis=(1, 2)), 1.0, atol=1e-4)
        assert not np.isnan(arr).any()


def test_final_sinc_includes_identity():
    keys = jax.random.split(jax.random.PRNGKey(3), 256)
    ks = np.array(jax.vmap(lambda k: random_final_sinc_kernel(k, CFG))(keys))
    ident = np.array(identity_kernel(21))
    n_ident = sum(np.allclose(k, ident) for k in ks)
    # final_sinc_prob=0.8 -> ~20% identity
    assert 20 <= n_ident <= 90


def test_iso_kernels_symmetric():
    # isotropic only config
    k = random_mixed_kernel(jax.random.PRNGKey(5), jnp.int32(13), 21,
                            (1.0, 0, 0, 0, 0, 0), (0.2, 3.0), (0.5, 4.0), (1.0, 2.0))
    arr = np.array(k)
    np.testing.assert_allclose(arr, arr.T, atol=1e-6)
    np.testing.assert_allclose(arr, arr[::-1, ::-1], atol=1e-6)
