"""RRDB generator (Real-ESRGAN), TPU-native.

Re-design of the reference ``Generator`` (/root/reference/model.py:206-275):
identical op graph — optional pixel-unshuffle front end, 3->64 conv, 23 RRDB
trunk, trunk conv + global residual, two nearest-x2-upsample+conv stages,
two output convs, clamp to [0, 1] — but NHWC layout, bf16-friendly compute
dtype, and optional per-RRDB rematerialization for training memory.

Parameter names mirror the reference state_dict (conv1, trunk_{i}/rdb{j}/
conv{k}, conv2, upsampling1/2, conv3, conv4) so the torch->JAX weight
converter (models/convert.py) is a pure rename + OIHW->HWIO transpose.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from einops import rearrange


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """PyTorch's default Conv2d init: kaiming_uniform(a=sqrt(5)) on HWIO."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init_factory(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def rdb_kernel_init(key, shape, dtype=jnp.float32):
    """Reference RDB init: kaiming_normal (fan_in mode) * 0.1
    (/root/reference/model.py:100-106)."""
    fan_in = shape[0] * shape[1] * shape[2]
    std = math.sqrt(2.0 / fan_in)
    return jax.random.normal(key, shape, dtype) * std * 0.1


def pixel_unshuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Space-to-depth with torch.nn.PixelUnshuffle channel ordering
    (out channel index = c * r^2 + dy * r + dx)."""
    if factor == 1:
        return x
    return rearrange(x, "b (h r1) (w r2) c -> b h w (c r1 r2)", r1=factor, r2=factor)


def _lrelu(x: jnp.ndarray) -> jnp.ndarray:
    return nn.leaky_relu(x, negative_slope=0.2)


def _conv3x3(x: jnp.ndarray, features: int, name: str, dtype: Any,
             rdb_init: bool = False) -> jnp.ndarray:
    """3x3 same conv registered directly under the calling module's scope."""
    fan_in = 9 * x.shape[-1]
    kernel_init = rdb_kernel_init if rdb_init else torch_conv_kernel_init
    bias_init = (nn.initializers.zeros if rdb_init
                 else torch_conv_bias_init_factory(fan_in))
    return nn.Conv(features, (3, 3), padding=1, dtype=dtype,
                   param_dtype=jnp.float32, kernel_init=kernel_init,
                   bias_init=bias_init, name=name)(x)


class ResidualDenseBlock(nn.Module):
    """5-conv dense block with 0.2-scaled residual (model.py:64-106)."""
    channels: int = 64
    growth: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        g, d = self.growth, self.dtype
        out1 = _lrelu(_conv3x3(x, g, "conv1", d, True))
        out2 = _lrelu(_conv3x3(jnp.concatenate([x, out1], -1), g, "conv2", d, True))
        out3 = _lrelu(_conv3x3(jnp.concatenate([x, out1, out2], -1), g, "conv3", d, True))
        out4 = _lrelu(_conv3x3(jnp.concatenate([x, out1, out2, out3], -1), g,
                               "conv4", d, True))
        out5 = _conv3x3(jnp.concatenate([x, out1, out2, out3, out4], -1),
                        self.channels, "conv5", d, True)
        return out5 * jnp.asarray(0.2, out5.dtype) + x


class RRDB(nn.Module):
    """Residual-in-residual dense block (model.py:109-132)."""
    channels: int = 64
    growth: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock(self.channels, self.growth, self.dtype, name="rdb1")(x)
        out = ResidualDenseBlock(self.channels, self.growth, self.dtype, name="rdb2")(out)
        out = ResidualDenseBlock(self.channels, self.growth, self.dtype, name="rdb3")(out)
        return out * jnp.asarray(0.2, out.dtype) + x


class Generator(nn.Module):
    """Real-ESRGAN generator, NHWC in/out, values in [0, 1]."""
    in_channels: int = 3
    out_channels: int = 3
    upscale_factor: int = 4
    num_rrdb: int = 23
    channels: int = 64
    growth: int = 32
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        # PixelUnshuffle front end: x2 -> unshuffle 2, x1 -> unshuffle 4
        # (model.py:209-220); x4 passes through.
        factor = {1: 4, 2: 2}.get(self.upscale_factor, 1)
        out = pixel_unshuffle(x, factor)
        out = out.astype(self.dtype)

        out1 = _conv3x3(out, self.channels, "conv1", self.dtype)

        block_cls = nn.remat(RRDB) if self.remat else RRDB
        out = out1
        for i in range(self.num_rrdb):
            out = block_cls(self.channels, self.growth, self.dtype,
                            name=f"trunk_{i}")(out)

        out2 = _conv3x3(out, self.channels, "conv2", self.dtype)
        out = out1 + out2

        for name in ("upsampling1", "upsampling2"):
            b, h, w, c = out.shape
            up = jnp.broadcast_to(out[:, :, None, :, None, :],
                                  (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)
            out = _lrelu(_conv3x3(up, self.channels, name, self.dtype))

        out = _lrelu(_conv3x3(out, self.channels, "conv3", self.dtype))
        out = _conv3x3(out, self.out_channels, "conv4", self.dtype)
        return jnp.clip(out.astype(jnp.float32), 0.0, 1.0)
