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
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
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


@jax.custom_vjp
def _st_clamp(x):
    """clamp(0, 1) with a straight-through gradient.

    The reference clamps the generator output inside forward
    (/root/reference/model.py:270) — a quirk this family's upstream
    (basicsr RRDBNet) does NOT have.  A hard clamp's zero gradient outside
    [0, 1] is a training trap: on bright data the randomly-initialized net
    saturates most pixels, a step or two later 100% of them clamp, the
    gradient vanishes identically and training is dead forever (reproduced
    and bisected on real photos; the torch reference collapses the same
    way).  Straight-through keeps the clamped VALUE (inference-identical)
    while letting gradients pull saturated pixels back in-range —
    gradients only differ from the reference where the reference's are
    zero.  Generator(st_clamp=False) restores the hard-clamp gradient.
    """
    return jnp.clip(x, 0.0, 1.0)


def _st_clamp_fwd(x):
    return jnp.clip(x, 0.0, 1.0), None


def _st_clamp_bwd(_, g):
    return (g,)


_st_clamp.defvjp(_st_clamp_fwd, _st_clamp_bwd)


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


class _ConvParams(nn.Module):
    """Declares conv kernel+bias with the same param tree as nn.Conv, but
    returns them raw so callers can repack kernels (see below)."""
    in_features: int
    features: int
    kernel_init: Any = rdb_kernel_init
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init,
                       (3, 3, self.in_features, self.features))
        b = self.param("bias", self.bias_init, (self.features,))
        return k, b


def _conv_raw(x: jnp.ndarray, kernel: jnp.ndarray, dtype: Any) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))


# Tap-transfer matrices for the subpixel upsampling conv: row r of the
# low-res kernel collects the high-res taps dy whose upsampled source row
# (2i + a + dy) // 2 equals i + r - 1, for output sub-position a in {0, 1}.
_SUBPIX_T = (
    np.array([[1, 0, 0], [0, 1, 1], [0, 0, 0]], np.float32),  # a = 0
    np.array([[0, 0, 0], [1, 1, 0], [0, 0, 1]], np.float32),  # a = 1
)


def _subpixel_upconv(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                     dtype: Any) -> jnp.ndarray:
    """nearest-x2-upsample -> 3x3 conv, recast as one low-res conv + shuffle.

    Mathematically identical (each high-res 3x3 window touches only a 2x2
    low-res neighbourhood; the tap sums are folded into a (3, 3, Cin, 4*Cout)
    kernel), but the conv runs at LOW resolution with 4x the output channels:
    on v5e that shape runs ~4x faster than 3x3 Cout=64 at 4x the pixels
    (57.9 vs 13.9 TF/s measured), with 2.25x less input traffic.
    """
    cout = kernel.shape[-1]
    subs = [jnp.einsum("ru,uvio,cv->rcio", jnp.asarray(ta), kernel,
                       jnp.asarray(tb))
            for ta in _SUBPIX_T for tb in _SUBPIX_T]
    w4 = jnp.concatenate(subs, axis=-1)             # (3,3,Cin,4*Cout), (a,b,o)
    y = _conv_raw(x, w4, dtype) + jnp.tile(bias, 4).astype(dtype)
    y = _lrelu(y)
    return rearrange(y, "n h w (a b o) -> n (h a) (w b) o", a=2, b=2, o=cout)


class ResidualDenseBlock(nn.Module):
    """5-conv dense block with 0.2-scaled residual (model.py:64-106).

    MXU-packed formulation: a concat conv ``conv([x, o1..ok])`` equals the sum
    of per-source convs with the kernel sliced along its input axis.  Grouping
    every conv's x-slice into ONE conv (and likewise per o_k) turns five
    32-output matmuls (25% MXU lane ceiling) into matmuls with 192/160/128/
    96/64 outputs — identical math, ~3x better systolic-array utilization.
    Parameter tree is unchanged (conv{1..5}/kernel+bias), so reference
    checkpoints convert 1:1.
    """
    channels: int = 64
    growth: int = 32
    dtype: Any = jnp.float32
    packed: bool = True

    @nn.compact
    def __call__(self, x):
        c, g, d = self.channels, self.growth, self.dtype
        k1, b1 = _ConvParams(c, g, name="conv1")()
        k2, b2 = _ConvParams(c + g, g, name="conv2")()
        k3, b3 = _ConvParams(c + 2 * g, g, name="conv3")()
        k4, b4 = _ConvParams(c + 3 * g, g, name="conv4")()
        k5, b5 = _ConvParams(c + 4 * g, c, name="conv5")()

        if not self.packed:
            def conv(t, k, b):
                return _conv_raw(t, k, d) + b.astype(d)

            o1 = _lrelu(conv(x, k1, b1))
            o2 = _lrelu(conv(jnp.concatenate([x, o1], -1), k2, b2))
            o3 = _lrelu(conv(jnp.concatenate([x, o1, o2], -1), k3, b3))
            o4 = _lrelu(conv(jnp.concatenate([x, o1, o2, o3], -1), k4, b4))
            o5 = conv(jnp.concatenate([x, o1, o2, o3, o4], -1), k5, b5)
            return o5 * jnp.asarray(0.2, o5.dtype) + x

        # packed: one conv per SOURCE, outputs for all consumers at once
        w_x = jnp.concatenate(
            [k1, k2[:, :, :c], k3[:, :, :c], k4[:, :, :c], k5[:, :, :c]], -1)
        w_o1 = jnp.concatenate(
            [k2[:, :, c:], k3[:, :, c:c + g], k4[:, :, c:c + g],
             k5[:, :, c:c + g]], -1)
        w_o2 = jnp.concatenate(
            [k3[:, :, c + g:], k4[:, :, c + g:c + 2 * g],
             k5[:, :, c + g:c + 2 * g]], -1)
        w_o3 = jnp.concatenate(
            [k4[:, :, c + 2 * g:], k5[:, :, c + 2 * g:c + 3 * g]], -1)
        w_o4 = k5[:, :, c + 3 * g:]

        base = _conv_raw(x, w_x, d)                       # N = 4g + c (192)
        o1 = _lrelu(base[..., :g] + b1.astype(d))
        t2 = _conv_raw(o1, w_o1, d)                       # N = 3g + c (160)
        o2 = _lrelu(base[..., g:2 * g] + t2[..., :g] + b2.astype(d))
        t3 = _conv_raw(o2, w_o2, d)                       # N = 2g + c (128)
        o3 = _lrelu(base[..., 2 * g:3 * g] + t2[..., g:2 * g]
                    + t3[..., :g] + b3.astype(d))
        t4 = _conv_raw(o3, w_o3, d)                       # N = g + c (96)
        o4 = _lrelu(base[..., 3 * g:4 * g] + t2[..., 2 * g:3 * g]
                    + t3[..., g:2 * g] + t4[..., :g] + b4.astype(d))
        t5 = _conv_raw(o4, w_o4, d)                       # N = c (64)
        o5 = (base[..., 4 * g:] + t2[..., 3 * g:] + t3[..., 2 * g:]
              + t4[..., g:] + t5 + b5.astype(d))
        return o5 * jnp.asarray(0.2, o5.dtype) + x


class RRDB(nn.Module):
    """Residual-in-residual dense block (model.py:109-132)."""
    channels: int = 64
    growth: int = 32
    dtype: Any = jnp.float32
    packed: bool = True

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock(self.channels, self.growth, self.dtype,
                                 self.packed, name="rdb1")(x)
        out = ResidualDenseBlock(self.channels, self.growth, self.dtype,
                                 self.packed, name="rdb2")(out)
        out = ResidualDenseBlock(self.channels, self.growth, self.dtype,
                                 self.packed, name="rdb3")(out)
        return out * jnp.asarray(0.2, out.dtype) + x


class TrunkFeatures(nn.Module):
    """Perceptual feature taps from a (frozen) stage-1 generator trunk.

    In-environment alternative to the reference's pretrained-VGG19
    ContentLoss (/root/reference/model.py:278-335) for deployments where the
    torchvision weights are unavailable: the stage-1 ESRNet generator's own
    early trunk is a TRAINED feature space over real images, unlike a
    random-init VGG (whose long-horizon NIQE drift is documented in
    docs/PARITY.md).  Tap t=0 is the conv1 output; tap t>=1 is the output of
    RRDB t-1.  Parameter names match the Generator subtree ("conv1",
    "trunk_i"), so frozen params are extracted directly from a stage-1
    checkpoint's generator tree (see ``trunk_feature_params``).

    Cost note: for x4 the trunk runs at INPUT resolution (no pixel-unshuffle
    downscale), so content inputs are the 256px HR crops — keep ``taps``
    shallow (default depth 2) to stay in the same FLOP class as the VGG path.
    """
    taps: Sequence[int] = (0, 1, 2)
    upscale_factor: int = 4
    channels: int = 64
    growth: int = 32
    dtype: Any = jnp.float32
    packed: bool = True
    # content_loss checks this: generator inputs are [0,1], NOT ImageNet-
    # normalized (VGG19Features lacks the attr and defaults to True)
    imagenet_input = False

    @nn.compact
    def __call__(self, x):
        factor = {1: 4, 2: 2}.get(self.upscale_factor, 1)
        out = pixel_unshuffle(x, factor).astype(self.dtype)
        out = _conv3x3(out, self.channels, "conv1", self.dtype)
        feats = []
        if 0 in self.taps:
            feats.append(out.astype(jnp.float32))
        for i in range(max(self.taps)):
            out = RRDB(self.channels, self.growth, self.dtype,
                       self.packed, name=f"trunk_{i}")(out)
            if (i + 1) in self.taps:
                feats.append(out.astype(jnp.float32))
        return feats


def trunk_feature_params(generator_params: dict, taps: Sequence[int]) -> dict:
    """Extract the frozen TrunkFeatures subtree from a full generator tree."""
    keys = ["conv1"] + [f"trunk_{i}" for i in range(max(taps))]
    missing = [k for k in keys if k not in generator_params]
    if missing:
        raise KeyError(f"generator params lack trunk layers {missing}")
    return {k: generator_params[k] for k in keys}


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
    packed: bool = True
    # run each upsample+conv as a subpixel conv at low res (identical math,
    # same param tree, ~4x faster on the MXU; see _subpixel_upconv)
    subpixel: bool = True
    # straight-through gradient for the output clamp (values identical;
    # avoids the reference's saturation training trap — see _st_clamp)
    st_clamp: bool = True
    # clamp=False returns the RAW pre-clamp output (basicsr-upstream
    # RRDBNet behavior: no clamp in forward at all).  Training losses
    # should run on this: the reference's in-forward clamp
    # (/root/reference/model.py:270) makes the L1 loss INDIFFERENT to
    # output magnitude once a pixel saturates — clamp(5.0)=1.0 scores zero
    # loss against GT 1.0 and contributes zero gradient (hard OR
    # straight-through), so nothing constrains the trunk's gain in
    # saturating directions and it can random-walk super-critical (the
    # measured InEnv10 collapse: forward 1e21 with params maxabs 0.19,
    # docs/ROUND4_NOTES.md).  Unclamped L1 penalizes overshoot linearly —
    # the restoring force the clamp removes.  Eval/inference keep
    # clamp=True (output parity with the reference).
    clamp: bool = True

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
                            self.packed, name=f"trunk_{i}")(out)

        out2 = _conv3x3(out, self.channels, "conv2", self.dtype)
        out = out1 + out2

        for name in ("upsampling1", "upsampling2"):
            if self.subpixel:
                k, bias = _ConvParams(
                    self.channels, self.channels,
                    kernel_init=torch_conv_kernel_init,
                    bias_init=torch_conv_bias_init_factory(9 * self.channels),
                    name=name)()
                out = _subpixel_upconv(out, k, bias, self.dtype)
            else:
                b, h, w, c = out.shape
                up = jnp.broadcast_to(
                    out[:, :, None, :, None, :],
                    (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)
                out = _lrelu(_conv3x3(up, self.channels, name, self.dtype))

        out = _lrelu(_conv3x3(out, self.channels, "conv3", self.dtype))
        out = _conv3x3(out, self.out_channels, "conv4", self.dtype)
        out = out.astype(jnp.float32)
        if not self.clamp:
            return out
        return _st_clamp(out) if self.st_clamp else jnp.clip(out, 0.0, 1.0)
