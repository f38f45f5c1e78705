"""Host-side numpy twins of the degradation ops, for offline data inspection.

The reference ships parallel numpy implementations of its noise/USM/filtering
ops alongside the torch ones (/root/reference/imgproc.py:606-826 noise,
:1497-1511 USM numpy, :1089-1106 filter2d numpy path).  In this framework the
production path is the batched on-device pipeline (ops/degradation.py); these
single-image numpy functions exist for the same reason the reference's do —
poking at data in a notebook or a prep script without touching a device.

Semantics match the reference's numpy functions; each docstring cites them.
Blur-kernel sampling reuses the on-device synthesizer evaluated eagerly on
CPU, so the two surfaces can never drift apart.
"""

from __future__ import annotations

from typing import Optional

import cv2
import numpy as np


def add_gaussian_noise_np(image: np.ndarray, sigma: float,
                          gray_noise: bool = False,
                          rng: Optional[np.random.Generator] = None,
                          clip: bool = True, rounds: bool = False) -> np.ndarray:
    """Reference ``_generate_gaussian_noise`` + add (imgproc.py:606-668).

    image: (H, W, 3) float32 in [0, 1]; sigma in 255-range units.
    """
    rng = rng or np.random.default_rng()
    if gray_noise:
        noise = rng.standard_normal(image.shape[:2] + (1,)).astype(np.float32)
    else:
        noise = rng.standard_normal(image.shape).astype(np.float32)
    out = image + noise * (sigma / 255.0)
    return _finalize_np(out, clip, rounds)


def add_poisson_noise_np(image: np.ndarray, scale: float = 1.0,
                         gray_noise: bool = False,
                         rng: Optional[np.random.Generator] = None,
                         clip: bool = True, rounds: bool = False) -> np.ndarray:
    """Reference ``_generate_poisson_noise`` + add (imgproc.py:671-734):
    quantize to 8-bit, vals = 2**ceil(log2(#unique levels)), draw
    Poisson(img * vals) / vals - img, scale."""
    rng = rng or np.random.default_rng()
    base = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY)[..., None] if gray_noise \
        else image
    img_q = np.clip(np.round(base * 255.0), 0, 255) / 255.0
    vals = 2.0 ** np.ceil(np.log2(max(len(np.unique(img_q)), 1)))
    noise = (rng.poisson(img_q * vals) / vals - img_q) * scale
    return _finalize_np(image + noise.astype(np.float32), clip, rounds)


def filter2d_np(image: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """cv2.filter2D with the reference's reflect border (imgproc.py:1110)."""
    return cv2.filter2D(image, -1, kernel, borderType=cv2.BORDER_REFLECT_101)


def usm_sharpen_np(image: np.ndarray, ksize: int = 51, weight: float = 0.5,
                   threshold: float = 10.0) -> np.ndarray:
    """Reference ``usm_sharp`` numpy twin (imgproc.py:1497-1511)."""
    k1d = _gaussian_kernel_np(ksize)
    blur = cv2.sepFilter2D(image, -1, k1d, k1d,
                           borderType=cv2.BORDER_REFLECT_101)
    residual = image - blur
    mask = (np.abs(residual) * 255.0 > threshold).astype(np.float32)
    soft = cv2.sepFilter2D(mask, -1, k1d, k1d,
                           borderType=cv2.BORDER_REFLECT_101)
    sharp = np.clip(image + weight * residual, 0.0, 1.0)
    return soft * sharp + (1.0 - soft) * image


def sample_blur_kernel_np(seed: int, stage: int = 1, kcfg=None) -> np.ndarray:
    """One random degradation blur kernel as numpy (21x21, sums to 1).

    Evaluates the on-device synthesizer (ops/blur_kernels.py) eagerly on CPU
    so the offline surface can never drift from the training pipeline
    (reference twin: the numpy samplers at imgproc.py:330-489)."""
    import jax

    from real_esrgan_tpu.configuration import KernelSynthesisConfig
    from real_esrgan_tpu.ops.blur_kernels import (
        random_first_order_kernel, random_second_order_kernel,
    )

    kcfg = kcfg or KernelSynthesisConfig()
    fn = random_first_order_kernel if stage == 1 else random_second_order_kernel
    with jax.default_device(jax.devices("cpu")[0]):
        return np.asarray(fn(jax.random.PRNGKey(seed), kcfg))


def _gaussian_kernel_np(ksize: int) -> np.ndarray:
    from real_esrgan_tpu.ops.usm import gaussian_kernel_1d

    return gaussian_kernel_1d(ksize, 0.0)


def _finalize_np(out: np.ndarray, clip: bool, rounds: bool) -> np.ndarray:
    if clip and rounds:
        return np.clip(np.round(out * 255.0), 0, 255).astype(np.float32) / 255.0
    if clip:
        return np.clip(out, 0.0, 1.0)
    if rounds:
        return np.round(out * 255.0).astype(np.float32) / 255.0
    return out
