"""Pallas TPU kernel: fully-fused ResidualDenseBlock.

The RDB (5 chained 3x3 convs with dense concat, /root/reference/model.py:87-98)
dominates the generator: 69 instances, ~93% of FLOPs.  Under XLA each conv
round-trips its activations through HBM (~10 tensor transfers per block); on
bandwidth-limited parts that — not the MXU — is the wall.  This kernel keeps
the whole block in VMEM:

* grid over (batch, spatial tiles); the input tile carries a 5-pixel halo on
  each side (5 chained 3x3 convs shrink by 1 px/conv), zero-padded outside the
  image by a cheap XLA pad before the call — matching 'same' conv semantics;
* convs are evaluated as 9 shifted (M, Cin) x (Cin, Cout) MXU matmuls with
  f32 accumulation;
* kernels are pre-packed per SOURCE (x, o1..o4) so matmul output widths are
  192/160/128/96/64 instead of five 32-wide matmuls (see
  models/rrdbnet.ResidualDenseBlock.packed — identical math);
* only the input tile and the T x T x 64 result touch HBM: ~5x less traffic
  than the unfused lowering.

Forward-only: the training path keeps the XLA formulation (it needs the VJP
and rematerializes anyway); inference/serving/bench use this kernel.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 5        # 5 chained 3x3 convs
_ALIGN_PAD = 6  # pads the DMA window from t+10 to t+16 (8-sublane aligned)


def _conv_tile(x_ref_slice, w_taps, out_size: int, acc_dtype=jnp.float32):
    """3x3 'valid' conv on a VMEM-resident tile via 9 shifted matmuls.

    x_ref_slice: (S, S, Cin) array (S = out_size + 2).
    w_taps: (9, Cin, Cout).
    Returns (out_size, out_size, Cout) in bf16.
    """
    s = out_size
    cin = x_ref_slice.shape[-1]
    cout = w_taps.shape[-1]
    acc = jnp.zeros((s * s, cout), acc_dtype)
    for dy in range(3):
        for dx in range(3):
            window = x_ref_slice[dy:dy + s, dx:dx + s, :].reshape(s * s, cin)
            acc = acc + jnp.dot(window, w_taps[dy * 3 + dx],
                                preferred_element_type=acc_dtype)
    return acc.reshape(s, s, cout).astype(jnp.bfloat16)


def _rdb_kernel(x_hbm, wx_ref, wo1_ref, wo2_ref, wo3_ref, wo4_ref, b_ref,
                out_ref, x_vmem, dma_sem, *, tile: int, channels: int,
                growth: int):
    t, c, g = tile, channels, growth

    # Overlapping halo windows can't be expressed as BlockSpec blocks; DMA
    # the halo window for this grid cell from HBM explicitly.  Mosaic needs
    # the sliced window extents 8-sublane aligned, so the window is
    # (t + 16)^2 (input is padded accordingly) and the kernel uses the
    # leading (t+10)^2 region.
    win = t + 2 * HALO + _ALIGN_PAD
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    copy = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(ti * t, win), pl.ds(tj * t, win), :],
        x_vmem, dma_sem)
    copy.start()
    copy.wait()
    # channels are zero-padded to a full 128 lane tile (DMA slices must be
    # lane-aligned); the padded K just idles MXU depth that K=64 would idle
    # anyway, and wx is zero-padded to match.
    x = x_vmem[:t + 2 * HALO, :t + 2 * HALO, :]       # (t+10, t+10, 128)

    def lrelu(v):
        # max/min form: bf16 vector compares are unsupported on this target
        zero = jnp.zeros((), v.dtype)
        return jnp.maximum(v, zero) + jnp.asarray(0.2, v.dtype) * jnp.minimum(v, zero)

    # base: every conv's x-contribution at once, on the (t+8) grid
    base = _conv_tile(x, wx_ref[...], t + 8)          # (t+8, t+8, 4g + c)

    b = b_ref[...]                                    # (4g + c,) f32 biases
    o1 = lrelu(base[..., :g] + b[:g].astype(jnp.bfloat16))
    t2 = _conv_tile(o1, wo1_ref[...], t + 6)          # (t+6, t+6, 3g + c)
    o2 = lrelu(base[1:t + 7, 1:t + 7, g:2 * g] + t2[..., :g]
               + b[g:2 * g].astype(jnp.bfloat16))
    t3 = _conv_tile(o2, wo2_ref[...], t + 4)          # (t+4, t+4, 2g + c)
    o3 = lrelu(base[2:t + 6, 2:t + 6, 2 * g:3 * g] + t2[1:t + 5, 1:t + 5, g:2 * g]
               + t3[..., :g] + b[2 * g:3 * g].astype(jnp.bfloat16))
    t4 = _conv_tile(o3, wo3_ref[...], t + 2)          # (t+2, t+2, g + c)
    o4 = lrelu(base[3:t + 5, 3:t + 5, 3 * g:4 * g] + t2[2:t + 4, 2:t + 4, 2 * g:3 * g]
               + t3[1:t + 3, 1:t + 3, g:2 * g] + t4[..., :g]
               + b[3 * g:4 * g].astype(jnp.bfloat16))
    t5 = _conv_tile(o4, wo4_ref[...], t)              # (t, t, c)
    o5 = (base[4:t + 4, 4:t + 4, 4 * g:] + t2[3:t + 3, 3:t + 3, 3 * g:]
          + t3[2:t + 2, 2:t + 2, 2 * g:] + t4[1:t + 1, 1:t + 1, g:]
          + t5 + b[4 * g:].astype(jnp.bfloat16))

    out_ref[0] = (o5 * jnp.asarray(0.2, o5.dtype)
                  + x[5:t + 5, 5:t + 5, :c])


def pack_rdb_weights(kernels: Sequence[jnp.ndarray],
                     biases: Sequence[jnp.ndarray], channels: int, growth: int):
    """(k1..k5 HWIO, b1..b5) -> per-source tap-major weights + packed bias."""
    c, g = channels, growth
    k1, k2, k3, k4, k5 = kernels

    def taps(w):
        # (3, 3, I, O) -> (9, I, O)
        return w.reshape(9, w.shape[2], w.shape[3])

    wx = jnp.concatenate(
        [k1, k2[:, :, :c], k3[:, :, :c], k4[:, :, :c], k5[:, :, :c]], -1)
    # zero-pad wx's input dim to a full 128 lane tile (see _rdb_kernel)
    lane = 128
    if c < lane:
        wx = jnp.pad(wx, ((0, 0), (0, 0), (0, lane - c), (0, 0)))
    wo1 = jnp.concatenate(
        [k2[:, :, c:], k3[:, :, c:c + g], k4[:, :, c:c + g], k5[:, :, c:c + g]], -1)
    wo2 = jnp.concatenate(
        [k3[:, :, c + g:], k4[:, :, c + g:c + 2 * g], k5[:, :, c + g:c + 2 * g]], -1)
    wo3 = jnp.concatenate([k4[:, :, c + 2 * g:], k5[:, :, c + 2 * g:c + 3 * g]], -1)
    wo4 = k5[:, :, c + 3 * g:]
    packed_b = jnp.concatenate(biases, -1)            # (4g + c,)
    bf = jnp.bfloat16
    return (taps(wx).astype(bf), taps(wo1).astype(bf), taps(wo2).astype(bf),
            taps(wo3).astype(bf), taps(wo4).astype(bf),
            packed_b.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("tile",))
def fused_rdb(x: jnp.ndarray, packed, tile: int = 64) -> jnp.ndarray:
    """Apply one fused RDB to (B, H, W, C) bf16 input (H, W % tile == 0)."""
    wx, wo1, wo2, wo3, wo4, bias = packed
    b, h, w, c = x.shape
    g = (wx.shape[-1] - c) // 4

    x = x.astype(jnp.bfloat16)
    lane = 128
    xp = jnp.pad(x, ((0, 0), (HALO, HALO + _ALIGN_PAD),
                     (HALO, HALO + _ALIGN_PAD), (0, max(0, lane - c))))

    grid = (b, h // tile, w // tile)
    kernel = functools.partial(_rdb_kernel, tile=tile, channels=c, growth=g)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),     # x stays off-chip; DMA'd
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, tile, c),
                               lambda bi, ti, tj: (bi, ti, tj, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * HALO + _ALIGN_PAD,
                        tile + 2 * HALO + _ALIGN_PAD, max(c, 128)),
                       jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xp, wx, wo1, wo2, wo3, wo4, bias)
