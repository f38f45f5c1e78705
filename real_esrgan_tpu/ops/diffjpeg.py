"""Differentiable JPEG compression, NHWC, batched with per-sample quality.

JAX/XLA re-design of the reference DiffJPEG stack
(/root/reference/imgproc.py:1124-1494).  The 8x8 DCT / inverse DCT are
expressed as (num_blocks, 64) x (64, 64) matmuls so they run on the MXU;
everything else is reshapes and elementwise math that XLA fuses.

Semantics matched to the reference:
  * quality -> factor mapping (imgproc.py:1124-1141)
  * standard luma / chroma quantization tables (imgproc.py:40-49)
  * 4:2:0 chroma subsampling via 2x2 average pooling + nearest upsample
  * zero padding to a multiple of 16, cropped back (imgproc.py:1480-1492)
  * hard rounding or the differentiable surrogate
    round(x) + (x - round(x))^3 (imgproc.py:1180-1192)
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

# Standard JPEG quantization tables (flattened row-major over (x, y)).
_Y_TABLE = np.array(
    [[16, 11, 10, 16, 24, 40, 51, 61],
     [12, 12, 14, 19, 26, 58, 60, 55],
     [14, 13, 16, 24, 40, 57, 69, 56],
     [14, 17, 22, 29, 51, 87, 80, 62],
     [18, 22, 37, 56, 68, 109, 103, 77],
     [24, 35, 55, 64, 81, 104, 113, 92],
     [49, 64, 78, 87, 103, 121, 120, 101],
     [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.float32)

_C_TABLE = np.full((8, 8), 99.0, dtype=np.float32)
_C_TABLE[:4, :4] = np.array(
    [[17, 18, 24, 47], [18, 21, 26, 66], [24, 26, 56, 99], [47, 66, 99, 99]],
    dtype=np.float32)


def _dct_matrix() -> np.ndarray:
    """(64, 64) forward DCT: blocks(x*8+y) @ D -> coeffs(u*8+v), scaled."""
    d = np.zeros((64, 64), dtype=np.float32)
    for x, y, u, v in itertools.product(range(8), repeat=4):
        d[x * 8 + y, u * 8 + v] = (
            np.cos((2 * x + 1) * u * np.pi / 16) * np.cos((2 * y + 1) * v * np.pi / 16))
    alpha = np.array([1.0 / np.sqrt(2)] + [1.0] * 7, dtype=np.float32)
    scale = (np.outer(alpha, alpha) * 0.25).reshape(64)
    return d * scale[None, :]


def _idct_matrix() -> np.ndarray:
    """(64, 64) inverse DCT: (coeffs * alpha) @ Di * 0.25 -> pixels."""
    di = np.zeros((64, 64), dtype=np.float32)
    for x, y, u, v in itertools.product(range(8), repeat=4):
        di[u * 8 + v, x * 8 + y] = (
            np.cos((2 * x + 1) * u * np.pi / 16) * np.cos((2 * y + 1) * v * np.pi / 16))
    return di * 0.25


# Host-side numpy constants — jit constant-folds them; importing this module
# must never bind a device backend (no import-side-effect device binding).
_DCT = _dct_matrix()
_IDCT = _idct_matrix()
_ALPHA = (
    np.outer(np.array([1.0 / np.sqrt(2)] + [1.0] * 7),
             np.array([1.0 / np.sqrt(2)] + [1.0] * 7)).reshape(64).astype(np.float32))

_RGB2YCBCR = np.array(
    [[0.299, 0.587, 0.114],
     [-0.168736, -0.331264, 0.5],
     [0.5, -0.418688, -0.081312]], dtype=np.float32).T
_YCBCR_SHIFT = np.array([0.0, 128.0, 128.0], dtype=np.float32)
_YCBCR2RGB = np.array(
    [[1.0, 0.0, 1.402],
     [1.0, -0.344136, -0.714136],
     [1.0, 1.772, 0.0]], dtype=np.float32).T


def quality_to_factor(quality: jnp.ndarray) -> jnp.ndarray:
    """JPEG quality in (0, 100] -> quantization scale factor.

    q == 100 maps to factor 0 in the raw formula (division by zero in the
    quantizer); clamp to a tiny positive factor so q=100 degrades to
    effectively-lossless instead of NaN (only the degenerate factor<=0 case is rescued).
    """
    q = jnp.asarray(quality, jnp.float32)
    factor = jnp.where(q < 50.0, 5000.0 / q, 200.0 - q * 2.0) / 100.0
    # only rescue the degenerate q == 100 case; legitimate q in (99.5, 100)
    # keeps its exact (tiny) factor
    return jnp.where(factor <= 0.0, 0.005, factor)


def _hard_round(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.round(x)


def _diff_round(x: jnp.ndarray) -> jnp.ndarray:
    r = jnp.round(x)
    return r + (x - r) ** 3


def _to_blocks(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) -> (B, H/8 * W/8, 64) row-major 8x8 blocks."""
    b, h, w = x.shape
    x = x.reshape(b, h // 8, 8, w // 8, 8)
    x = jnp.transpose(x, (0, 1, 3, 2, 4))
    return x.reshape(b, (h // 8) * (w // 8), 64)


def _from_blocks(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    b = x.shape[0]
    x = x.reshape(b, h // 8, w // 8, 8, 8)
    x = jnp.transpose(x, (0, 1, 3, 2, 4))
    return x.reshape(b, h, w)


def _dct8x8(blocks: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(blocks - 128.0, _DCT,
                      precision=jax.lax.Precision.HIGHEST)


def _idct8x8(coeffs: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(coeffs * _ALPHA, _IDCT,
                      precision=jax.lax.Precision.HIGHEST) + 128.0


def diff_jpeg(image: jnp.ndarray, quality: jnp.ndarray,
              differentiable: bool = False) -> jnp.ndarray:
    """JPEG-compress-decompress a batch of NHWC RGB images in [0, 1].

    Args:
        image: (B, H, W, 3) float in [0, 1].
        quality: scalar or (B,) quality values in (0, 100].
        differentiable: use the cubic rounding surrogate (the trainers use
            hard rounding, reference train_realesrnet.py:231).
    """
    rnd = _diff_round if differentiable else _hard_round
    b, h, w, _ = image.shape
    quality = jnp.broadcast_to(jnp.asarray(quality, jnp.float32), (b,))
    factor = quality_to_factor(quality).reshape(b, 1, 1)

    h_pad = (16 - h % 16) % 16
    w_pad = (16 - w % 16) % 16
    x = jnp.pad(image, ((0, 0), (0, h_pad), (0, w_pad), (0, 0)))
    hp, wp = h + h_pad, w + w_pad

    # --- compress ---
    ycbcr = x * 255.0 @ _RGB2YCBCR + _YCBCR_SHIFT
    y = ycbcr[..., 0]
    # 4:2:0 subsample: 2x2 mean of each chroma plane
    cbcr = ycbcr[..., 1:3].reshape(b, hp // 2, 2, wp // 2, 2, 2).mean(axis=(2, 4))
    cb, cr = cbcr[..., 0], cbcr[..., 1]

    y_table = jnp.asarray(_Y_TABLE.reshape(64))
    c_table = jnp.asarray(_C_TABLE.reshape(64))

    y_q = rnd(_dct8x8(_to_blocks(y)) / (y_table * factor))
    cb_q = rnd(_dct8x8(_to_blocks(cb)) / (c_table * factor))
    cr_q = rnd(_dct8x8(_to_blocks(cr)) / (c_table * factor))

    # --- decompress ---
    y_d = _from_blocks(_idct8x8(y_q * (y_table * factor)), hp, wp)
    cb_d = _from_blocks(_idct8x8(cb_q * (c_table * factor)), hp // 2, wp // 2)
    cr_d = _from_blocks(_idct8x8(cr_q * (c_table * factor)), hp // 2, wp // 2)

    # nearest (repeat) chroma upsample, as the reference (imgproc.py:1392-1405)
    cb_u = jnp.repeat(jnp.repeat(cb_d, 2, axis=1), 2, axis=2)
    cr_u = jnp.repeat(jnp.repeat(cr_d, 2, axis=1), 2, axis=2)

    ycbcr_out = jnp.stack([y_d, cb_u, cr_u], axis=-1)
    rgb = (ycbcr_out + jnp.asarray([0.0, -128.0, -128.0])) @ _YCBCR2RGB
    rgb = jnp.clip(rgb, 0.0, 255.0) / 255.0
    return rgb[:, :h, :w, :]
