"""Trainer validation must be compile-bounded by buckets, not by image count.

The reference's validate() jits per raw image shape (every Set5/Set14 image
differs -> a multi-minute XLA compile per image on a relayed TPU).  Our
validate() pads LR inputs to bucket multiples, so N differently-sized images
cost at most as many compiles as distinct buckets.
"""

import jax
import jax.numpy as jnp
import numpy as np

from train_realesrnet import validate


class _ShapeDataset:
    def __init__(self, shapes):
        self.shapes = shapes

    def __len__(self):
        return len(self.shapes)

    def __getitem__(self, i):
        h, w = self.shapes[i]
        rng = np.random.default_rng(i)
        return {"lr": rng.random((h, w, 3)).astype(np.float32)}


class _FakeNIQE:
    def __call__(self, sr):
        return np.asarray([5.0])


def test_validate_compiles_once_per_bucket():
    @jax.jit
    def eval_fn(params, lr):
        b, h, w, c = lr.shape
        return jnp.tile(lr, (1, 4, 4, 1)) * params  # fake x4 SR

    # five images, three distinct 32-buckets: (32,32), (32,64), (64,32)
    ds = _ShapeDataset([(13, 17), (30, 32), (20, 40), (7, 57), (55, 9)])
    score = validate(eval_fn, jnp.float32(1.0), ds, _FakeNIQE(), "Valid", 0,
                     writer=None, scale=4, bucket=32)
    assert score == 5.0
    assert eval_fn._cache_size() == 3, eval_fn._cache_size()
