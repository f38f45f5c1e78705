"""Unsharp-mask sharpening with a soft threshold mask.

JAX re-design of ``USMSharp`` (/root/reference/imgproc.py:1514-1537).  The
reference materializes the 2-D Gaussian as an outer product and runs a dense
51x51 filter; a Gaussian is separable, so we run two 1-D depthwise passes —
O(k) instead of O(k^2) taps (identical math, reflect padding is separable).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from real_esrgan_tpu.ops.filter2d import filter2d_separable


def gaussian_kernel_1d(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """cv2.getGaussianKernel clone (sigma<=0 -> cv2's size-derived sigma)."""
    if ksize % 2 == 0:
        ksize += 1
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def usm_sharpen(image: jnp.ndarray, kernel_1d: jnp.ndarray,
                weight: float = 0.5, threshold: float = 10.0) -> jnp.ndarray:
    """Sharpen NHWC images in [0, 1].

    out = soft_mask * clip(x + weight * residual) + (1 - soft_mask) * x where
    residual = x - gaussian_blur(x) and soft_mask = blur(|residual|*255 > thr).
    """
    blur = filter2d_separable(image, kernel_1d)
    residual = image - blur
    mask = (jnp.abs(residual) * 255.0 > threshold).astype(image.dtype)
    soft_mask = filter2d_separable(mask, kernel_1d)
    sharp = jnp.clip(image + weight * residual, 0.0, 1.0)
    return soft_mask * sharp + (1.0 - soft_mask) * image
