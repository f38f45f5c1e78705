"""Spectral-norm power-iteration cadence parity vs torch.

The reference's torch ``spectral_norm`` advances u on EVERY train-mode
forward: the G-step's D(sr) (/root/reference/train_realesrgan.py:479), the
D-step's D(hr) (:499) and D(sr.detach()) (:505) — 3 updates per iteration.
The fused GAN step mirrors that exact sequence (train/esrgan.py).  This test
pins the equivalence: with converted reference-grammar weights held fixed,
running N iterations of the 3-forward sequence through torch's spectral_norm
and through our flax SpectralNorm must keep the logits in lockstep — the
u/sigma trajectories are the only moving state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
from torch import nn as tnn
from torch.nn.utils import spectral_norm as sn

from real_esrgan_tpu.models import UNetDiscriminator
from real_esrgan_tpu.models.convert import convert_discriminator

RNG = np.random.default_rng(29)


class TorchTwin(tnn.Module):
    """Torch oracle with the reference's U-Net D topology + spectral_norm
    (architecture per SURVEY.md C4; written for this test, not copied)."""

    def __init__(self, c: int = 64):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, c, 3, 1, 1)
        self.down1 = sn(tnn.Conv2d(c, 2 * c, 4, 2, 1, bias=False))
        self.down2 = sn(tnn.Conv2d(2 * c, 4 * c, 4, 2, 1, bias=False))
        self.down3 = sn(tnn.Conv2d(4 * c, 8 * c, 4, 2, 1, bias=False))
        self.up1 = sn(tnn.Conv2d(8 * c, 4 * c, 3, 1, 1, bias=False))
        self.up2 = sn(tnn.Conv2d(4 * c, 2 * c, 3, 1, 1, bias=False))
        self.up3 = sn(tnn.Conv2d(2 * c, c, 3, 1, 1, bias=False))
        self.conv2 = sn(tnn.Conv2d(c, c, 3, 1, 1, bias=False))
        self.conv3 = sn(tnn.Conv2d(c, c, 3, 1, 1, bias=False))
        self.conv4 = tnn.Conv2d(c, 1, 3, 1, 1)

    def forward(self, x):
        def up2x(t):
            return F.interpolate(t, scale_factor=2, mode="bilinear",
                                 align_corners=False)

        act = lambda t: F.leaky_relu(t, 0.2)  # noqa: E731
        out1 = self.conv1(x)
        d1 = act(self.down1(out1))
        d2 = act(self.down2(d1))
        d3 = act(self.down3(d2))
        u1 = act(self.up1(up2x(d3))) + d2
        u2 = act(self.up2(up2x(u1))) + d1
        u3 = act(self.up3(up2x(u2))) + out1
        out = act(self.conv2(u3))
        out = act(self.conv3(out))
        return self.conv4(out)


_GRAMMAR = {"down1": "down_block1.0", "down2": "down_block2.0",
            "down3": "down_block3.0", "up1": "up_block1.0",
            "up2": "up_block2.0", "up3": "up_block3.0",
            "conv2": "conv2.0", "conv3": "conv3.0",
            "conv1": "conv1", "conv4": "conv4"}


def test_three_forward_cadence_tracks_torch():
    torch.manual_seed(29)
    twin = TorchTwin().train()

    # export in the reference checkpoint grammar and convert
    ref_sd = {}
    for attr, ref_name in _GRAMMAR.items():
        mod_sd = getattr(twin, attr).state_dict()
        for k, v in mod_sd.items():
            ref_sd[f"{ref_name}.{k}"] = v.detach().clone()
    params, stats = convert_discriminator(ref_sd)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    stats = jax.tree_util.tree_map(jnp.asarray, stats)

    d = UNetDiscriminator()

    @jax.jit
    def fwd(stats, x):
        out, vs = d.apply({"params": params, "batch_stats": stats}, x,
                          update_stats=True, mutable=["batch_stats"])
        return out, vs["batch_stats"]

    max_err = 0.0
    for it in range(4):
        sr = RNG.random((2, 32, 32, 3)).astype(np.float32)
        hr = RNG.random((2, 32, 32, 3)).astype(np.float32)
        for x in (sr, hr, sr):  # G-step D(sr), D-step D(hr), D(sr.detach())
            with torch.no_grad():
                ref = twin(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
            ours, stats = fwd(stats, jnp.asarray(x))
            ours = np.asarray(ours).transpose(0, 3, 1, 2)
            max_err = max(max_err, float(np.abs(ours - ref).max()))
    assert max_err < 5e-4, f"logit divergence {max_err} after 4 iterations"
