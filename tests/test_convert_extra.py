"""Conversion coverage: discriminator spectral-norm checkpoints and
pixel-unshuffle channel ordering vs torch."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from real_esrgan_tpu.models import UNetDiscriminator
from real_esrgan_tpu.models.convert import convert_discriminator
from real_esrgan_tpu.models.rrdbnet import pixel_unshuffle

RNG = np.random.default_rng(13)


def _torch_disc_state():
    """Random weights using the reference Discriminator key grammar
    (torch spectral_norm stores weight_orig / weight_u / weight_v)."""
    sd = {}

    def conv(name, cin, cout, k, sn):
        w = torch.from_numpy((RNG.standard_normal((cout, cin, k, k)) * 0.05
                              ).astype(np.float32))
        if sn:
            sd[f"{name}.weight_orig"] = w
            sd[f"{name}.weight_u"] = torch.from_numpy(
                RNG.standard_normal(cout).astype(np.float32))
            sd[f"{name}.weight_v"] = torch.from_numpy(
                RNG.standard_normal(cin * k * k).astype(np.float32))
        else:
            sd[f"{name}.weight"] = w
            sd[f"{name}.bias"] = torch.zeros(cout)

    conv("conv1", 3, 64, 3, sn=False)
    conv("down_block1.0", 64, 128, 4, sn=True)
    conv("down_block2.0", 128, 256, 4, sn=True)
    conv("down_block3.0", 256, 512, 4, sn=True)
    conv("up_block1.0", 512, 256, 3, sn=True)
    conv("up_block2.0", 256, 128, 3, sn=True)
    conv("up_block3.0", 128, 64, 3, sn=True)
    conv("conv2.0", 64, 64, 3, sn=True)
    conv("conv3.0", 64, 64, 3, sn=True)
    conv("conv4", 64, 1, 3, sn=False)
    return sd


def test_discriminator_conversion_runs():
    sd = _torch_disc_state()
    params, stats = convert_discriminator(sd)

    d = UNetDiscriminator()
    ref_vars = d.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    # converted trees must be structurally compatible with the model
    assert set(params.keys()) == set(ref_vars["params"].keys())
    for sn, entries in ref_vars["batch_stats"].items():
        assert sn in stats
        for key in entries:
            if key.endswith("/u"):
                assert key in stats[sn]

    out, new_state = d.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        jnp.ones((1, 64, 64, 3)) * 0.4, update_stats=True,
        mutable=["batch_stats"])
    assert out.shape == (1, 64, 64, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_pixel_unshuffle_matches_torch():
    x = RNG.random((2, 8, 8, 3)).astype(np.float32)
    for r in (2, 4):
        ours = np.asarray(pixel_unshuffle(jnp.asarray(x), r))
        theirs = torch.nn.PixelUnshuffle(r)(
            torch.from_numpy(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(ours.transpose(0, 3, 1, 2),
                                   theirs.numpy(), atol=0)
