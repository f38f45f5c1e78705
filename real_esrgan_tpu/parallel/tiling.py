"""Overlap-tile spatial decomposition for large-image serving (2K -> 8K).

The reference has no tiling support — inference feeds whole images of
arbitrary size (/root/reference/inference.py:40-53), which on TPU would
recompile per shape and blow HBM at 8K.  Here the image plane is decomposed
into fixed-size overlapping tiles (context-parallelism over H x W instead of
sequence length — SURVEY.md §5):

* every tile has the SAME static shape -> one XLA compilation, MXU stays hot;
* tiles are batched and the tile-batch axis is sharded across the device
  mesh -> full multi-chip occupancy from a single input image;
* each tile's output keeps only its central region (halo trimmed), so seams
  only reflect receptive-field truncation beyond ``overlap`` pixels.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from real_esrgan_tpu.parallel.mesh import batch_sharding, make_mesh


def tiled_upscale(apply_fn: Callable, params, image: np.ndarray,
                  scale: int = 4, tile: int = 256, overlap: int = 16,
                  tile_batch: int = 8, mesh=None) -> np.ndarray:
    """x``scale`` upscale of one (H, W, 3) image via batched overlap tiles.

    Args:
        apply_fn: jittable (params, (B, tile, tile, 3)) -> (B, tile*s, tile*s, 3).
        image: float32 RGB in [0, 1].
        tile: static tile size fed to the network.
        overlap: halo on each side; core stride is tile - 2*overlap.
        tile_batch: tiles per device batch (static).
        mesh: optional device mesh; tile batches are sharded over it.
    """
    if mesh is None:
        mesh = make_mesh()
    n_dev = len(mesh.devices.ravel())
    if tile_batch % n_dev:
        tile_batch = max(n_dev, (tile_batch // n_dev) * n_dev)

    h, w, c = image.shape
    core = tile - 2 * overlap
    assert core > 0, "overlap too large for tile size"

    ny = max(1, math.ceil(h / core))
    nx = max(1, math.ceil(w / core))

    # reflect-pad so every core cell is fully covered and halos are in-bounds
    pad_h = overlap + (ny * core - h) + overlap
    pad_w = overlap + (nx * core - w) + overlap
    padded = np.pad(image, ((overlap, pad_h - overlap),
                            (overlap, pad_w - overlap), (0, 0)), mode="reflect")

    tiles = np.empty((ny * nx, tile, tile, c), np.float32)
    for iy in range(ny):
        for ix in range(nx):
            y0, x0 = iy * core, ix * core
            tiles[iy * nx + ix] = padded[y0:y0 + tile, x0:x0 + tile]

    # pad tile count to a full batch and run fixed-size batches
    n_tiles = tiles.shape[0]
    n_batches = math.ceil(n_tiles / tile_batch)
    if n_tiles < n_batches * tile_batch:
        reps = np.repeat(tiles[-1:], n_batches * tile_batch - n_tiles, axis=0)
        tiles = np.concatenate([tiles, reps], axis=0)

    sharding = batch_sharding(mesh)
    fn = jax.jit(apply_fn)
    outs = []
    for i in range(n_batches):
        batch = jax.device_put(
            jnp.asarray(tiles[i * tile_batch:(i + 1) * tile_batch]), sharding)
        outs.append(np.asarray(fn(params, batch)))
    sr_tiles = np.concatenate(outs, axis=0)[:n_tiles]

    # stitch core regions
    out = np.empty((ny * core * scale, nx * core * scale, c), np.float32)
    o_s, c_s = overlap * scale, core * scale
    for iy in range(ny):
        for ix in range(nx):
            srt = sr_tiles[iy * nx + ix]
            out[iy * c_s:(iy + 1) * c_s, ix * c_s:(ix + 1) * c_s] = (
                srt[o_s:o_s + c_s, o_s:o_s + c_s])
    return out[:h * scale, :w * scale]
