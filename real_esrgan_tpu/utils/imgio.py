"""Image IO and array conversion helpers (NHWC, RGB, [0, 1] float).

Replaces the reference's cv2 + image_to_tensor/tensor_to_image pair
(/root/reference/imgproc.py:1540-1596) for the NHWC JAX world.
"""

from __future__ import annotations

import os

import cv2
import numpy as np


def load_image_rgb(path: str) -> np.ndarray:
    """Read an image file -> (H, W, 3) float32 RGB in [0, 1]."""
    bgr = cv2.imread(path, cv2.IMREAD_COLOR)
    if bgr is None:
        raise FileNotFoundError(f"Cannot read image: {path}")
    return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0


def save_image_rgb(path: str, image: np.ndarray) -> None:
    """Write (H, W, 3) float RGB in [0, 1] (or uint8) to disk."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
    cv2.imwrite(path, cv2.cvtColor(arr, cv2.COLOR_RGB2BGR))


def image_to_array(image: np.ndarray, range_norm: bool = False) -> np.ndarray:
    """(H, W, C) [0,1] -> (1, H, W, C) float32, optionally scaled to [-1, 1]."""
    arr = np.asarray(image, np.float32)[None]
    if range_norm:
        arr = arr * 2.0 - 1.0
    return arr


def array_to_image(array: np.ndarray, range_norm: bool = False) -> np.ndarray:
    """(1, H, W, C) or (H, W, C) float -> (H, W, C) uint8."""
    arr = np.asarray(array)
    if arr.ndim == 4:
        arr = arr[0]
    if range_norm:
        arr = (arr + 1.0) / 2.0
    return np.clip(arr * 255.0, 0, 255).astype(np.uint8)


def natsorted_files(directory: str):
    """Natural-sorted image files (reference uses natsort, test.py:57);
    non-image entries are skipped so stray files don't abort evaluation."""
    import re

    exts = (".png", ".jpg", ".jpeg", ".bmp", ".webp", ".tif", ".tiff", ".ppm", ".gif")

    def key(name):
        return [int(t) if t.isdigit() else t.lower()
                for t in re.split(r"(\d+)", name)]

    names = [f for f in os.listdir(directory) if f.lower().endswith(exts)]
    return [os.path.join(directory, f) for f in sorted(names, key=key)]
