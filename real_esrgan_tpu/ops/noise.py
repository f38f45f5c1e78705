"""Batched Gaussian / Poisson sensor-noise injection, NHWC, explicit keys.

JAX re-design of the torch noise family in the reference
(/root/reference/imgproc.py:829-1086): per-sample noise strength vectors,
gray-noise blending, and the Poisson unique-value scaling trick.  The
reference's per-sample Python loop over ``torch.unique``
(imgproc.py:892,903) is replaced by a scatter-free 256-bit presence bitset
(masked OR-reductions + popcount) — images are quantized to 8-bit levels
first, so counting distinct values compiles into the training step.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from real_esrgan_tpu.ops.color import rgb_to_grayscale


def _unique_levels(image: jnp.ndarray) -> jnp.ndarray:
    """Number of distinct 8-bit levels per sample (B,) for (B,...) in [0,1].

    Exact, scatter-free: a 256-bit presence bitset per sample, built as eight
    uint32 words by masked OR-reductions + popcount.  (A scatter-based
    histogram serializes on TPU — measured 20x slower.)
    """
    levels = jnp.clip(jnp.round(image * 255.0), 0, 255).astype(jnp.int32)
    flat = levels.reshape(levels.shape[0], -1)
    word = flat >> 5                                   # (B, N) in [0, 8)
    mask = (jnp.uint32(1) << (flat & 31).astype(jnp.uint32))

    counts = jnp.zeros((flat.shape[0],), jnp.int32)
    for w in range(8):
        m = jnp.where(word == w, mask, jnp.uint32(0))
        ored = jax.lax.reduce(m, jnp.uint32(0), jax.lax.bitwise_or, (1,))
        counts = counts + jax.lax.population_count(ored).astype(jnp.int32)
    return counts


def _vals_from_unique(unique: jnp.ndarray) -> jnp.ndarray:
    """2 ** ceil(log2(#unique)) (reference imgproc.py:893)."""
    u = jnp.maximum(unique.astype(jnp.float32), 1.0)
    return jnp.exp2(jnp.ceil(jnp.log2(u)))


def gaussian_noise(key: jax.Array, image: jnp.ndarray, sigma: jnp.ndarray,
                   gray_mask: jnp.ndarray) -> jnp.ndarray:
    """Per-sample Gaussian noise (sigma measured in /255 units).

    Args:
        image: (B, H, W, C) in [0, 1].
        sigma: (B,) noise std in 255-range.
        gray_mask: (B,) 1.0 where the sample gets luminance-only noise.
    """
    b, h, w, c = image.shape
    k_col, k_gray = jax.random.split(key)
    sigma = sigma.reshape(b, 1, 1, 1) / 255.0
    noise = jax.random.normal(k_col, image.shape, image.dtype) * sigma
    noise_gray = jax.random.normal(k_gray, (b, h, w, 1), image.dtype) * sigma
    g = gray_mask.reshape(b, 1, 1, 1)
    return noise * (1.0 - g) + noise_gray * g


def _poisson_residual(key: jax.Array, rates: jnp.ndarray,
                      approx: bool) -> jnp.ndarray:
    """Draw Poisson(rates) - rates.

    approx=True draws ONE standard normal z per element and maps it to a
    Poisson-like count two ways, switching on the rate:

    * lam >= 2: Cornish-Fisher skew-corrected rounded normal
          X = round(lam + sqrt(lam) * z + (z^2 - 1) / 6),  clamped to >= 0,
      matching the first THREE moments (KS distance to the exact pmf:
      0.005 at lam=2, <0.001 for lam>=16).
    * lam < 2: EXACT inverse-CDF through the coupled uniform u = Phi(z),
      over atoms 0..8 (P(X>8 | lam<2) < 3e-4) — the CF expansion breaks
      down for tiny rates (uniform dark regions quantize to vals=1, i.e.
      lam ~ 0.03, where CF doubles the hit probability).

    All elementwise: ~20 VPU ops vs jax.random.poisson's rejection sampler
    (74.5 ms -> 3.8 ms at bs8 on the 608^2 canvas).
    """
    if approx:
        z = jax.random.normal(key, rates.shape, rates.dtype)
        cf = jnp.maximum(
            jnp.round(rates + z * jnp.sqrt(rates) + (z * z - 1.0) / 6.0), 0.0)

        # exact small-lambda inverse CDF, coupled to the same z
        u = jax.scipy.stats.norm.cdf(z)
        safe = jnp.minimum(rates, 2.0)        # keep the series well-behaved
        term = jnp.exp(-safe)
        cdf = term
        small = jnp.zeros_like(rates)
        for i in range(1, 9):
            small = small + (u > cdf).astype(rates.dtype)
            term = term * safe / i
            cdf = cdf + term
        small = small + (u > cdf).astype(rates.dtype)  # atom 9 tail guard

        return jnp.where(rates < 2.0, small, cf) - rates
    return jax.random.poisson(key, rates, rates.shape).astype(rates.dtype) - rates


def poisson_noise(key: jax.Array, image: jnp.ndarray, scale: jnp.ndarray,
                  gray_mask: jnp.ndarray, approx: bool = False) -> jnp.ndarray:
    """Per-sample Poisson (shot) noise scaled by ``scale``.

    Matches `_generate_poisson_noise_torch` (imgproc.py:866-916): quantize to
    8-bit, estimate level count, draw Poisson(image * vals) / vals - image.
    ``approx`` swaps the exact sampler for a moment-matched rounded normal.
    """
    b, h, w, c = image.shape
    k_col, k_gray = jax.random.split(key)

    img_q = jnp.clip(jnp.round(image * 255.0), 0, 255) / 255.0
    vals = _vals_from_unique(_unique_levels(img_q)).reshape(b, 1, 1, 1)
    noise = _poisson_residual(k_col, img_q * vals, approx) / vals

    gray = rgb_to_grayscale(image)
    gray_q = jnp.clip(jnp.round(gray * 255.0), 0, 255) / 255.0
    vals_g = _vals_from_unique(_unique_levels(gray_q)).reshape(b, 1, 1, 1)
    noise_gray = _poisson_residual(k_gray, gray_q * vals_g, approx) / vals_g

    g = gray_mask.reshape(b, 1, 1, 1)
    noise = noise * (1.0 - g) + noise_gray * g
    return noise * scale.reshape(b, 1, 1, 1)


def _finalize(out: jnp.ndarray, clip: bool, rounds: bool) -> jnp.ndarray:
    if clip and rounds:
        return jnp.clip(jnp.round(out * 255.0), 0, 255) / 255.0
    if clip:
        return jnp.clip(out, 0.0, 1.0)
    if rounds:
        return jnp.round(out * 255.0) / 255.0
    return out


def random_add_gaussian_noise(key: jax.Array, image: jnp.ndarray,
                              sigma_range: Tuple[float, float],
                              gray_prob: float, clip: bool = True,
                              rounds: bool = False) -> jnp.ndarray:
    """Reference ``random_add_gaussian_noise_torch`` (imgproc.py:1029-1057)."""
    b = image.shape[0]
    k_sig, k_gray, k_noise = jax.random.split(key, 3)
    sigma = jax.random.uniform(k_sig, (b,), minval=sigma_range[0],
                               maxval=sigma_range[1])
    gray = (jax.random.uniform(k_gray, (b,)) < gray_prob).astype(image.dtype)
    out = image + gaussian_noise(k_noise, image, sigma, gray)
    return _finalize(out, clip, rounds)


def random_add_poisson_noise(key: jax.Array, image: jnp.ndarray,
                             scale_range: Tuple[float, float],
                             gray_prob: float, clip: bool = True,
                             rounds: bool = False) -> jnp.ndarray:
    """Reference ``random_add_poisson_noise_torch`` (imgproc.py:1060-1086)."""
    b = image.shape[0]
    k_sc, k_gray, k_noise = jax.random.split(key, 3)
    scale = jax.random.uniform(k_sc, (b,), minval=scale_range[0],
                               maxval=scale_range[1])
    gray = (jax.random.uniform(k_gray, (b,)) < gray_prob).astype(image.dtype)
    out = image + poisson_noise(k_noise, image, scale, gray)
    return _finalize(out, clip, rounds)
