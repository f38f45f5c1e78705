"""Production serving pipeline: load once, upscale anything.

The reference's inference path jits per input shape (a new compile for every
image size — /root/reference/inference.py feeds whole images).  This wraps
the generator in a shape-disciplined pipeline:

* small images: padded to bucketed shapes (multiples of ``bucket``) so a
  handful of compilations serve any size, then cropped back;
* large images: overlap-tile decomposition (parallel/tiling.py) with a single
  static tile shape, tile batches sharded across the device mesh;
* weights loaded from reference ``.pth.tar`` or Orbax checkpoints.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from real_esrgan_tpu.models import Generator
from real_esrgan_tpu.parallel.mesh import make_mesh
from real_esrgan_tpu.parallel.tiling import tiled_upscale
from real_esrgan_tpu.train.checkpoint import load_generator_params


class SRPipeline:
    def __init__(self, weights_path: str = "", upscale_factor: int = 4,
                 num_rrdb: int = 23, bfloat16: bool = True,
                 bucket: int = 32, tile_threshold: int = 512,
                 tile: int = 528, tile_overlap: int = 8, tile_batch: int = 8,
                 mesh=None):
        # Tiling default 528/8/8: measured-best geometry; see
        # parallel/tiling.py::tiled_upscale for the sweep evidence.
        self.scale = upscale_factor
        self.bucket = bucket
        self.tile_threshold = tile_threshold
        self.tile = tile
        self.tile_overlap = tile_overlap
        self.tile_batch = tile_batch
        self.mesh = mesh if mesh is not None else make_mesh()

        self.model = Generator(upscale_factor=upscale_factor,
                               num_rrdb=num_rrdb,
                               dtype=jnp.bfloat16 if bfloat16 else jnp.float32)
        if weights_path:
            self.params = load_generator_params(weights_path)
        else:
            self.params = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]

        self._apply = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x))

    def upscale(self, image: np.ndarray) -> np.ndarray:
        """x`scale` one (H, W, 3) float RGB image in [0, 1]."""
        h, w, _ = image.shape
        if max(h, w) > self.tile_threshold:
            return tiled_upscale(self._apply, self.params, image,
                                 scale=self.scale, tile=self.tile,
                                 overlap=self.tile_overlap,
                                 tile_batch=self.tile_batch, mesh=self.mesh)

        hb = math.ceil(h / self.bucket) * self.bucket
        wb = math.ceil(w / self.bucket) * self.bucket
        padded = np.pad(image, ((0, hb - h), (0, wb - w), (0, 0)),
                        mode="reflect" if min(h, w) > 1 else "edge")
        sr = self._apply(self.params, jnp.asarray(padded[None]))
        return np.asarray(sr)[0, :h * self.scale, :w * self.scale]

    def upscale_batch(self, images) -> list:
        return [self.upscale(img) for img in images]
