"""Batched 2-D filtering with per-sample kernels (cv2.filter2D semantics).

JAX/XLA re-design of ``filter2d_torch`` (/root/reference/imgproc.py:1089-1121):
reflect padding, correlation (not convolution-flipped), the same kernel applied
to every channel of a sample, optionally a distinct kernel per sample.

Layout is NHWC.  The per-sample case maps to a single depthwise
``lax.conv_general_dilated`` over a (1, H, W, B*C) view so XLA sees one fused
conv instead of a Python loop over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def filter2d(image: jnp.ndarray, kernel: jnp.ndarray,
             compute_dtype=None) -> jnp.ndarray:
    """Filter a batch of NHWC images.

    Args:
        image: (B, H, W, C) float array.
        kernel: (k, k) shared kernel or (B, k, k) per-sample kernels. k odd.
        compute_dtype: optional lower-precision compute type (e.g. bf16 for
            the degradation blurs, where the ~3e-3 error vanishes under the
            final 8-bit quantization); output keeps the input dtype.

    Returns:
        (B, H, W, C) filtered image (same spatial size, reflect-padded edges).
    """
    in_dtype = image.dtype
    if compute_dtype is not None:
        image = image.astype(compute_dtype)
    if kernel.ndim == 2:
        kernel = kernel[None]
    b, h, w, c = image.shape
    k = kernel.shape[-1]
    if k % 2 != 1:
        raise ValueError("Kernel size must be odd.")
    pad = k // 2

    x = jnp.pad(image, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")

    if kernel.shape[0] == 1:
        # Shared kernel: depthwise conv over C features.
        w_dw = jnp.broadcast_to(kernel[0][..., None, None], (k, k, 1, c))
        w_dw = w_dw.astype(image.dtype)
        out = lax.conv_general_dilated(
            x, w_dw,
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        return out.astype(in_dtype)

    # Per-sample kernels: fold batch into features -> one depthwise conv.
    x = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, h + 2 * pad, w + 2 * pad, b * c)
    w_dw = jnp.repeat(kernel[..., None], c, axis=-1)          # (B, k, k, C)
    w_dw = jnp.transpose(w_dw, (1, 2, 0, 3)).reshape(k, k, 1, b * c)
    w_dw = w_dw.astype(image.dtype)
    out = lax.conv_general_dilated(
        x, w_dw,
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b * c,
    )
    return jnp.transpose(out.reshape(h, w, b, c), (2, 0, 1, 3)).astype(in_dtype)


def filter2d_separable(image: jnp.ndarray, kernel_1d: jnp.ndarray) -> jnp.ndarray:
    """Separable filtering with a shared 1-D kernel (two depthwise passes).

    Used for Gaussian blurs (e.g. USM) where the 2-D kernel is an outer
    product; O(k) instead of O(k^2) taps.
    """
    b, h, w, c = image.shape
    k = kernel_1d.shape[0]
    pad = k // 2
    kv = jnp.broadcast_to(kernel_1d[:, None, None, None], (k, 1, 1, c)).astype(image.dtype)
    kh = jnp.broadcast_to(kernel_1d[None, :, None, None], (1, k, 1, c)).astype(image.dtype)

    x = jnp.pad(image, ((0, 0), (pad, pad), (0, 0), (0, 0)), mode="reflect")
    x = lax.conv_general_dilated(
        x, kv, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    x = lax.conv_general_dilated(
        x, kh, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return x
