"""Geometric augmentation and paired cropping, NHWC, explicit keys.

Replaces the reference's host-side cv2 augments and batch-shared crop
(/root/reference/imgproc.py:1871-2001, dataset.py:70-72).  On TPU the
augments are per-sample traced ops inside the jitted step; the paired crop
picks an independent position per sample (the reference shares one position
across the whole batch, imgproc.py:1913-1914 — per-sample is strictly more
diverse with identical marginals).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def center_crop(image: jnp.ndarray, size: int) -> jnp.ndarray:
    """Center-crop an HWC or NHWC image to (size, size)."""
    h, w = image.shape[-3], image.shape[-2]
    top, left = (h - size) // 2, (w - size) // 2
    return image[..., top:top + size, left:left + size, :]


def random_orientation(key: jax.Array, batch: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample per-sample (rot90 count, hflip, vflip) like the reference's
    random_rotate + random flips (dataset.py:70-72)."""
    k_rot, k_h, k_v = jax.random.split(key, 3)
    rot = jax.random.randint(k_rot, (batch,), 0, 4)
    hflip = jax.random.uniform(k_h, (batch,)) < 0.5
    vflip = jax.random.uniform(k_v, (batch,)) < 0.5
    return rot, hflip, vflip


def apply_orientation(image: jnp.ndarray, rot: jnp.ndarray, hflip: jnp.ndarray,
                      vflip: jnp.ndarray) -> jnp.ndarray:
    """Apply a traced orientation to one HWC (square) image."""
    image = jax.lax.switch(rot, [
        lambda x: x,
        lambda x: jnp.rot90(x, 1),
        lambda x: jnp.rot90(x, 2),
        lambda x: jnp.rot90(x, 3),
    ], image)
    image = jnp.where(hflip, image[:, ::-1, :], image)
    image = jnp.where(vflip, image[::-1, :, :], image)
    return image


def paired_random_crop(key: jax.Array, lr: jnp.ndarray, hr: jnp.ndarray,
                       hr_crop: int, scale: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Crop aligned (LR, HR) patches, one random position per sample.

    Matches the coordinate relation of the reference's ``random_crop``
    (imgproc.py:1894-1934): HR position is sampled, LR position is
    hr_pos // scale.
    """
    b, hr_h, hr_w, _ = hr.shape
    lr_crop = hr_crop // scale
    k_t, k_l = jax.random.split(key)
    # sample on the LR grid and scale up so the pair is exactly aligned
    # (the reference floors an arbitrary HR corner, imgproc.py:1913-1918,
    # which can misalign the pair by up to scale-1 HR pixels)
    tops = jax.random.randint(k_t, (b,), 0, (hr_h - hr_crop) // scale + 1) * scale
    lefts = jax.random.randint(k_l, (b,), 0, (hr_w - hr_crop) // scale + 1) * scale

    def crop_one(lr_i, hr_i, top, left):
        lr_patch = jax.lax.dynamic_slice(
            lr_i, (top // scale, left // scale, 0),
            (lr_crop, lr_crop, lr_i.shape[-1]))
        hr_patch = jax.lax.dynamic_slice(
            hr_i, (top, left, 0), (hr_crop, hr_crop, hr_i.shape[-1]))
        return lr_patch, hr_patch

    return jax.vmap(crop_one)(lr, hr, tops, lefts)
