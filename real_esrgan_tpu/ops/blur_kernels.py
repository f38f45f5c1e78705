"""On-device random blur-kernel synthesis for the degradation pipeline.

TPU-native re-design of the reference's host-side kernel generators
(/root/reference/imgproc.py:170-603 and their use in
/root/reference/dataset.py:81-141).

Key idea: the reference generates a KxK kernel (K random in {7..21}) and
zero-pads it to 21x21 for batching (/root/reference/dataset.py:102-103).
Padding a centered kernel is identical to evaluating the kernel's radial
profile on the fixed 21x21 coordinate grid and *masking* cells outside the
KxK support.  Masked evaluation needs no dynamic shapes, so the whole sampler
compiles into the training step and vmaps per sample — kernels are synthesized
on the TPU, not by host dataloader workers.

RNG is explicit ``jax.random`` keys throughout (the reference relies on global
``np.random``/``random`` seeding, /root/reference/config.py:64-66).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from real_esrgan_tpu.configuration import KernelSynthesisConfig


def bessel_j1(x: jnp.ndarray) -> jnp.ndarray:
    """Bessel function of the first kind, order 1.

    Standard Abramowitz & Stegun rational approximations (eqs. 9.4.4/9.4.6),
    accurate to ~1e-8; JAX has no builtin j1.
    """
    ax = jnp.abs(x)
    # |x| < 8 branch
    y = x * x
    p1 = x * (72362614232.0 + y * (-7895059235.0 + y * (242396853.1 + y * (
        -2972611.439 + y * (15704.48260 + y * (-30.16036606))))))
    q1 = 144725228442.0 + y * (2300535178.0 + y * (18583304.74 + y * (
        99447.43394 + y * (376.9991397 + y))))
    small = p1 / q1
    # |x| >= 8 branch
    z = 8.0 / jnp.maximum(ax, 1e-30)
    y2 = z * z
    xx = ax - 2.356194491
    p2 = 1.0 + y2 * (0.183105e-2 + y2 * (-0.3516396496e-4 + y2 * (
        0.2457520174e-5 + y2 * (-0.240337019e-6))))
    q2 = 0.04687499995 + y2 * (-0.2002690873e-3 + y2 * (0.8449199096e-5 + y2 * (
        -0.88228987e-6 + y2 * 0.105787412e-6)))
    big = jnp.sqrt(0.636619772 / jnp.maximum(ax, 1e-30)) * (
        jnp.cos(xx) * p2 - z * jnp.sin(xx) * q2) * jnp.sign(x)
    return jnp.where(ax < 8.0, small, big)


def _grid(pad_to: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Centered coordinate grid of the padded kernel canvas (e.g. -10..10)."""
    ax = jnp.arange(pad_to, dtype=jnp.float32) - (pad_to - 1) / 2.0
    return jnp.meshgrid(ax, ax, indexing="xy")


def _support_mask(pad_to: int, kernel_size: jnp.ndarray) -> jnp.ndarray:
    """1.0 inside the centered kernel_size x kernel_size support, else 0."""
    xx, yy = _grid(pad_to)
    half = (kernel_size.astype(jnp.float32) - 1.0) / 2.0
    return ((jnp.abs(xx) <= half + 0.5) & (jnp.abs(yy) <= half + 0.5)).astype(jnp.float32)


def bivariate_kernel_grid(pad_to: int,
                          kernel_size: jnp.ndarray,
                          sigma_x: jnp.ndarray,
                          sigma_y: jnp.ndarray,
                          theta: jnp.ndarray,
                          beta: jnp.ndarray,
                          form: jnp.ndarray) -> jnp.ndarray:
    """Evaluate a bivariate blur kernel on the padded grid with masked support.

    form: 0 = Gaussian exp(-q/2), 1 = generalized exp(-(q/2)^beta)... note the
    reference computes exp(-0.5 * q^beta) (imgproc.py:287) and 1/(q^beta + 1)
    for plateau (imgproc.py:324) where q = v^T Sigma^-1 v; we match exactly.
    """
    xx, yy = _grid(pad_to)
    # Sigma = R(theta) diag(sx^2, sy^2) R(theta)^T ; build Sigma^-1 directly.
    ct, st = jnp.cos(theta), jnp.sin(theta)
    inv_sx2 = 1.0 / (sigma_x * sigma_x)
    inv_sy2 = 1.0 / (sigma_y * sigma_y)
    a = ct * ct * inv_sx2 + st * st * inv_sy2
    b = ct * st * (inv_sx2 - inv_sy2)
    c = st * st * inv_sx2 + ct * ct * inv_sy2
    q = a * xx * xx + 2.0 * b * xx * yy + c * yy * yy

    beta_eff = jnp.where(form == 1, beta, 1.0)
    qb = jnp.power(jnp.maximum(q, 1e-20), beta_eff)
    qb = jnp.where(q <= 0.0, 0.0, qb)           # 0^beta = 0, avoid NaN grads
    exp_form = jnp.exp(-0.5 * qb)
    plateau_q = jnp.power(jnp.maximum(q, 1e-20), beta)
    plateau_q = jnp.where(q <= 0.0, 0.0, plateau_q)
    plateau_form = 1.0 / (plateau_q + 1.0)
    kernel = jnp.where(form == 2, plateau_form, exp_form)

    mask = _support_mask(pad_to, kernel_size)
    kernel = kernel * mask
    return kernel / jnp.sum(kernel)


def sinc_kernel_grid(pad_to: int,
                     kernel_size: jnp.ndarray,
                     cutoff: jnp.ndarray) -> jnp.ndarray:
    """2-D sinc (ringing) filter on the padded grid.

    Matches ``generate_sinc_kernel`` (/root/reference/imgproc.py:576-603):
    cutoff * J1(cutoff * r) / (2 pi r), centre value cutoff^2 / (4 pi).
    """
    xx, yy = _grid(pad_to)
    r = jnp.sqrt(xx * xx + yy * yy)
    val = cutoff * bessel_j1(cutoff * r) / (2.0 * jnp.pi * jnp.maximum(r, 1e-20))
    centre = cutoff * cutoff / (4.0 * jnp.pi)
    kernel = jnp.where(r == 0.0, centre, val)
    kernel = kernel * _support_mask(pad_to, kernel_size)
    return kernel / jnp.sum(kernel)


def identity_kernel(pad_to: int) -> jnp.ndarray:
    """Dirac pulse: filtering with it is a no-op (reference dataset.py:56-58)."""
    k = jnp.zeros((pad_to, pad_to), jnp.float32)
    return k.at[pad_to // 2, pad_to // 2].set(1.0)


def _sample_beta(key: jax.Array, beta_range: Tuple[float, float]) -> jnp.ndarray:
    """Coin-flip between U(lo, 1) and U(1, hi) (reference imgproc.py:411-414)."""
    k1, k2, k3 = jax.random.split(key, 3)
    lo = jax.random.uniform(k2, minval=beta_range[0], maxval=1.0)
    hi = jax.random.uniform(k3, minval=1.0, maxval=beta_range[1])
    return jnp.where(jax.random.uniform(k1) < 0.5, lo, hi)


def random_mixed_kernel(key: jax.Array,
                        kernel_size: jnp.ndarray,
                        pad_to: int,
                        type_probs: Tuple[float, ...],
                        sigma_range: Tuple[float, float],
                        generalized_beta_range: Tuple[float, float],
                        plateau_beta_range: Tuple[float, float]) -> jnp.ndarray:
    """Sample one mixed blur kernel (reference ``random_mixed_kernels``,
    imgproc.py:492-573), with type order
    [iso, aniso, generalized_iso, generalized_aniso, plateau_iso, plateau_aniso].
    """
    k_type, k_sx, k_sy, k_rot, k_bg, k_bp = jax.random.split(key, 6)
    t = jax.random.choice(k_type, 6, p=jnp.asarray(type_probs, jnp.float32))
    is_iso = (t % 2) == 0
    form = t // 2          # 0 gauss, 1 generalized, 2 plateau

    sigma_x = jax.random.uniform(k_sx, minval=sigma_range[0], maxval=sigma_range[1])
    sigma_y_aniso = jax.random.uniform(k_sy, minval=sigma_range[0], maxval=sigma_range[1])
    sigma_y = jnp.where(is_iso, sigma_x, sigma_y_aniso)
    theta = jnp.where(is_iso, 0.0,
                      jax.random.uniform(k_rot, minval=-math.pi, maxval=math.pi))
    beta = jnp.where(form == 2,
                     _sample_beta(k_bp, plateau_beta_range),
                     _sample_beta(k_bg, generalized_beta_range))
    return bivariate_kernel_grid(pad_to, kernel_size, sigma_x, sigma_y, theta,
                                 beta, form)


def _random_stage_kernel(key: jax.Array,
                         cfg: KernelSynthesisConfig,
                         sinc_prob: float,
                         type_probs: Tuple[float, ...],
                         sigma_range: Tuple[float, float],
                         gen_beta_range: Tuple[float, float],
                         plat_beta_range: Tuple[float, float]) -> jnp.ndarray:
    """One first/second-order degradation kernel (reference dataset.py:81-128)."""
    k_size, k_coin, k_omega, k_mixed = jax.random.split(key, 4)
    sizes = jnp.asarray(cfg.kernel_sizes, jnp.int32)
    kernel_size = sizes[jax.random.randint(k_size, (), 0, len(cfg.kernel_sizes))]

    sorted_sizes = sorted(cfg.kernel_sizes)
    n = len(sorted_sizes)
    median_size = (sorted_sizes[n // 2] if n % 2 else
                   (sorted_sizes[n // 2 - 1] + sorted_sizes[n // 2]) / 2.0)
    # reference compares against int(np.median(...)) (dataset.py:85)
    median_size = int(median_size)
    # sinc cutoff range depends on kernel size (reference dataset.py:85-88)
    lo = jnp.where(kernel_size < median_size, math.pi / 3.0, math.pi / 5.0)
    omega_c = jax.random.uniform(k_omega, minval=0.0, maxval=1.0) * (math.pi - lo) + lo

    sinc = sinc_kernel_grid(cfg.pad_to, kernel_size, omega_c)
    mixed = random_mixed_kernel(k_mixed, kernel_size, cfg.pad_to, type_probs,
                                sigma_range, gen_beta_range, plat_beta_range)
    use_sinc = jax.random.uniform(k_coin) < sinc_prob
    return jnp.where(use_sinc, sinc, mixed)


def random_first_order_kernel(key: jax.Array, cfg: KernelSynthesisConfig) -> jnp.ndarray:
    return _random_stage_kernel(key, cfg, cfg.sinc_prob1, cfg.kernel_type_probs1,
                                cfg.sigma_range1, cfg.generalized_beta_range1,
                                cfg.plateau_beta_range1)


def random_second_order_kernel(key: jax.Array, cfg: KernelSynthesisConfig) -> jnp.ndarray:
    return _random_stage_kernel(key, cfg, cfg.sinc_prob2, cfg.kernel_type_probs2,
                                cfg.sigma_range2, cfg.generalized_beta_range2,
                                cfg.plateau_beta_range2)


def random_final_sinc_kernel(key: jax.Array, cfg: KernelSynthesisConfig) -> jnp.ndarray:
    """Final sinc kernel or identity pulse (reference dataset.py:130-137)."""
    k_coin, k_size, k_omega = jax.random.split(key, 3)
    sizes = jnp.asarray(cfg.kernel_sizes, jnp.int32)
    kernel_size = sizes[jax.random.randint(k_size, (), 0, len(cfg.kernel_sizes))]
    omega_c = jax.random.uniform(k_omega, minval=math.pi / 3.0, maxval=math.pi)
    sinc = sinc_kernel_grid(cfg.pad_to, kernel_size, omega_c)
    use_sinc = jax.random.uniform(k_coin) < cfg.final_sinc_prob
    return jnp.where(use_sinc, sinc, identity_kernel(cfg.pad_to))
