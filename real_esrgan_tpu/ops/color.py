"""Color-space conversions (BT.601), NHWC layout.

JAX re-design of the conversion family in the reference
(/root/reference/imgproc.py:1715-1868).  All functions take float images in
[0, 1] with channels last (TPU-native layout) and are jit/vmap friendly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as _np

# Module constants stay host-side numpy: jit traces constant-fold them, and
# importing this module must never bind a device backend (the reference binds
# its device exactly once, config.py:68 — never as an import side effect).
# MATLAB rgb2ycbcr coefficients (x255 domain), BT.601.
_RGB2Y = _np.array([65.481, 128.553, 24.966], _np.float32)
_RGB2YCBCR = _np.array([
    [65.481, -37.797, 112.0],
    [128.553, -74.203, -93.786],
    [24.966, 112.0, -18.214],
], _np.float32)
_YCBCR_BIAS = _np.array([16.0, 128.0, 128.0], _np.float32)

_YCBCR2RGB = _np.array([
    [0.00456621, 0.00456621, 0.00456621],
    [0.0, -0.00153632, 0.00791071],
    [0.00625893, -0.00318811, 0.0],
], _np.float32)
_YCBCR2RGB_BIAS = _np.array([-222.921, 135.576, -276.836], _np.float32)

# ITU-R 601-2 luma (torchvision rgb_to_grayscale; used by Poisson gray noise,
# reference imgproc.py:888)
_GRAY = _np.array([0.299, 0.587, 0.114], _np.float32)


def rgb2ycbcr(image: jnp.ndarray, only_y: bool = False) -> jnp.ndarray:
    """MATLAB ``rgb2ycbcr`` on [0,1] float images, channels last."""
    if only_y:
        out = image @ _RGB2Y.astype(image.dtype) + 16.0
        out = out[..., None]
    else:
        out = image @ _RGB2YCBCR.astype(image.dtype) + _YCBCR_BIAS.astype(image.dtype)
    return out / 255.0


def bgr2ycbcr(image: jnp.ndarray, only_y: bool = False) -> jnp.ndarray:
    """MATLAB ``bgr2ycbcr`` (BGR channel order input)."""
    return rgb2ycbcr(image[..., ::-1], only_y)


def ycbcr2rgb(image: jnp.ndarray) -> jnp.ndarray:
    x = image * 255.0
    out = x @ _YCBCR2RGB.astype(image.dtype) * 255.0 + _YCBCR2RGB_BIAS.astype(image.dtype)
    return out / 255.0


def ycbcr2bgr(image: jnp.ndarray) -> jnp.ndarray:
    return ycbcr2rgb(image)[..., ::-1]


def rgb_to_grayscale(image: jnp.ndarray) -> jnp.ndarray:
    """ITU-R 601-2 luma transform, keeps a singleton channel axis."""
    return (image @ _GRAY.astype(image.dtype))[..., None]


def expand_y(image_uint8_bgr) -> "np.ndarray":
    """BGR uint8 (HW C) -> float64 Y-channel in [0, 255] with HWC shape.

    Host-side counterpart of the reference's ``expand_y``
    (/root/reference/imgproc.py:1690-1712), used by Y-channel metrics.
    """
    import numpy as np

    img = np.asarray(image_uint8_bgr).astype(np.float32) / 255.0
    y = img @ np.array([24.966, 128.553, 65.481]) + 16.0
    return (y / 255.0)[..., None].astype(np.float64) * 255.0
