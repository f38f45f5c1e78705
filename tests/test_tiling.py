"""Overlap-tile serving tests: stitched output shape/continuity and closeness
to the untiled forward in tile interiors."""

import jax
import jax.numpy as jnp
import numpy as np

from real_esrgan_tpu.models import Generator
from real_esrgan_tpu.parallel import make_mesh
from real_esrgan_tpu.parallel.tiling import tiled_upscale

RNG = np.random.default_rng(3)


def _small_model():
    model = Generator(upscale_factor=4, num_rrdb=2, channels=16, growth=8)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]

    def apply_fn(p, x):
        return model.apply({"params": p}, x)

    return apply_fn, params


def test_tiled_matches_full_forward():
    apply_fn, params = _small_model()
    img = RNG.random((96, 120, 3)).astype(np.float32)

    full = np.asarray(apply_fn(params, jnp.asarray(img[None])))[0]
    tiled = tiled_upscale(apply_fn, params, img, scale=4, tile=64, overlap=16,
                          tile_batch=8)
    assert tiled.shape == full.shape == (384, 480, 3)
    # interiors must match closely; seams only reflect receptive-field
    # truncation beyond the 16px halo of this shallow 2-RRDB test model
    diff = np.abs(tiled - full)
    assert diff.mean() < 5e-3, diff.mean()
    assert np.isfinite(tiled).all()


def test_tiled_nonmultiple_sizes_and_device_padding():
    apply_fn, params = _small_model()
    img = RNG.random((70, 50, 3)).astype(np.float32)
    out = tiled_upscale(apply_fn, params, img, scale=4, tile=64, overlap=8,
                        tile_batch=3, mesh=make_mesh())
    assert out.shape == (280, 200, 3)
    assert np.isfinite(out).all()
