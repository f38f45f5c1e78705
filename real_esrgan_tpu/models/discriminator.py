"""Spectral-norm U-Net discriminator, TPU-native (NHWC).

Re-design of the reference ``Discriminator`` (/root/reference/model.py:135-203):
3->64 conv, three stride-2 4x4 SN-conv down blocks (64->128->256->512), three
bilinear-x2-upsample + 3x3 SN-conv up blocks with skip additions, two SN-conv
heads and a final 1-channel pixel-wise logit map.  Spectral normalization uses
flax.linen.SpectralNorm (1 power-iteration step per call, matching torch's
``spectral_norm`` default); the u/v state lives in the ``batch_stats``
collection and is threaded through the GAN train step.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from real_esrgan_tpu.models.rrdbnet import (
    torch_conv_bias_init_factory, torch_conv_kernel_init,
)


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


def _upsample_bilinear_2x(x: jnp.ndarray) -> jnp.ndarray:
    """F.interpolate(scale_factor=2, mode='bilinear', align_corners=False)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear",
                            antialias=False)


class UNetDiscriminator(nn.Module):
    channels: int = 64
    dtype: Any = jnp.float32

    def _sn_conv(self, features: int, kernel: int, stride: int, name: str):
        # padding 1 in both cases: 3x3/s1 'same', and the reference's 4x4/s2
        # halving convs use (4,4),(2,2),(1,1) (model.py:140-150)
        conv = nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                       padding=1, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32,
                       kernel_init=torch_conv_kernel_init, name=name)
        return nn.SpectralNorm(conv)

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        c = self.channels
        x = x.astype(self.dtype)
        out1 = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                       param_dtype=jnp.float32,
                       kernel_init=torch_conv_kernel_init,
                       bias_init=torch_conv_bias_init_factory(9 * x.shape[-1]),
                       name="conv1")(x)

        down1 = _lrelu(self._sn_conv(2 * c, 4, 2, "down1")(out1, update_stats=update_stats))
        down2 = _lrelu(self._sn_conv(4 * c, 4, 2, "down2")(down1, update_stats=update_stats))
        down3 = _lrelu(self._sn_conv(8 * c, 4, 2, "down3")(down2, update_stats=update_stats))

        up = _upsample_bilinear_2x(down3)
        up1 = _lrelu(self._sn_conv(4 * c, 3, 1, "up1")(up, update_stats=update_stats))
        up1 = up1 + down2

        up = _upsample_bilinear_2x(up1)
        up2 = _lrelu(self._sn_conv(2 * c, 3, 1, "up2")(up, update_stats=update_stats))
        up2 = up2 + down1

        up = _upsample_bilinear_2x(up2)
        up3 = _lrelu(self._sn_conv(c, 3, 1, "up3")(up, update_stats=update_stats))
        up3 = up3 + out1

        out = _lrelu(self._sn_conv(c, 3, 1, "conv2")(up3, update_stats=update_stats))
        out = _lrelu(self._sn_conv(c, 3, 1, "conv3")(out, update_stats=update_stats))
        out = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                      param_dtype=jnp.float32,
                      kernel_init=torch_conv_kernel_init,
                      bias_init=torch_conv_bias_init_factory(9 * c),
                      name="conv4")(out)
        return out.astype(jnp.float32)
