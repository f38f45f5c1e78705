"""Pallas TPU kernel: fully-fused ResidualDenseBlock.

The RDB (5 chained 3x3 convs with dense concat, /root/reference/model.py:87-98)
dominates the generator: 69 instances, ~93% of FLOPs.  Under XLA each conv
round-trips its activations through HBM (~10 tensor transfers per block); on
bandwidth-limited parts that — not the MXU — is the wall.  This kernel keeps
the whole block in VMEM: only the haloed input tile and the T x T x 64 result
touch HBM (~5x less traffic than the unfused lowering).

Design notes (shaped by Mosaic's constraints):
* grid over (batch, spatial tiles); the input tile carries a 5-pixel halo per
  side (5 chained 3x3 convs), zero-padded outside the image by an XLA pad
  before the call — matching 'same' conv semantics;
* the input's channel dim is zero-padded to a full 128-lane tile (DMA slices
  must be lane-aligned); the padded K only idles MXU depth K=64 idles anyway;
* a concat conv ``conv([x, o1..ok])`` is evaluated as per-source convs summed
  (identical math; avoids lane-dim concats, which Mosaic relayouts);
* each conv is a 9-iteration fori_loop of (s^2, Cin) x (Cin, Cout) MXU dots
  with f32 accumulation — small IR so the (remote) Mosaic compiler copes;
* no lane-dim slicing anywhere: every matmul output is consumed whole.

STATUS (round 1, measured on v5e via the axon relay): numerically correct
(bf16-level match vs the flax block) but ~8x SLOWER than the XLA path at
tile=32 (14.9-16.0 ms/RDB vs ~1.8 ms).  Bisected:
  * a DMA-only variant of the same kernel runs at 1.35 ms/call -> the halo
    DMA is NOT the bottleneck;
  * the 135 per-tap matmuls run at ~0.13 TF/s each; switching the per-tap
    reshape+dot to a 3-D dot_general changed nothing (16.0 ms) -> the cost
    is the spatially-offset window SLICES (sublane-shift relayouts per tap)
    plus small-matmul overhead, not data movement;
  * larger tiles (64/128) and the 45-matmul source-packed variant OOM-kill
    the remote Mosaic compiler.
Kept as an experimental opt-in (`Generator` does NOT use it); the XLA
source-packed formulation in models/rrdbnet.py is the production path.

ROUND-2 CONCLUSION (measured on v5e via the axon relay, tools/pallas_conv_exp.py):
the planned im2col redesign was built and bisected — a single conv as a
lane-packed (rows*W, 3C) patch matrix + 3 sublane-aligned MXU dots is
numerically exact but still loses to XLA (29 vs 43 TF/s).  The root cause is
NOT the kernel structure: Mosaic's matmul codegen itself tops out far below
XLA's on this toolchain —
    pure VMEM-resident dot, 32 reps in-kernel, f32 acc:
      (8192x192)@(192x192)   10.2 TF/s     (2048x512)@(512x512)  19.5 TF/s
      (8192x96)@(96x160)      4.5 TF/s     (1024^3)              35.5 TF/s
    vs XLA bf16 matmul peak on the same chip: 144.7 TF/s (8192^3),
    and XLA's own 3x3 convs: 46 TF/s at Cin=64, 106 TF/s at Cin=128.
No VMEM-residency win can recover a 4x codegen deficit, so a fused-RDB
Pallas kernel CANNOT beat XLA here; the perf work moved to XLA-level
formulations (models/rrdbnet.py) and the degradation pipeline instead.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 5        # 5 chained 3x3 convs
_ALIGN_PAD = 6  # pads the DMA window from t+10 to t+16 (8-sublane aligned)
_LANE = 128


def _conv_tile(x, w_taps, out_size: int):
    """3x3 'valid' conv on a VMEM-resident (S, S, Cin) value.

    w_taps: (9, Cin, Cout).  Returns (out_size, out_size, Cout) bf16.
    """
    s = out_size
    cout = w_taps.shape[-1]

    # static unroll (dynamic_slice is not lowerable in Pallas TPU); contract
    # the channel dim directly on the 3-D window — no (s*s, cin) reshape, so
    # Mosaic avoids a relayout copy per tap
    acc = jnp.zeros((s, s, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            window = x[dy:dy + s, dx:dx + s, :]
            acc = acc + jax.lax.dot_general(
                window, w_taps[dy * 3 + dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc.astype(jnp.bfloat16)


def _lrelu(v):
    # max/min form: bf16 vector compares are unsupported on this target
    zero = jnp.zeros((), v.dtype)
    return jnp.maximum(v, zero) + jnp.asarray(0.2, v.dtype) * jnp.minimum(v, zero)


def _crop(v, k: int, size: int):
    """Spatial center-offset crop v[k:k+size, k:k+size, :] (static)."""
    return v[k:k + size, k:k + size, :]


def _rdb_kernel(x_hbm, w1x, w2x, w2o1, w3x, w3o1, w3o2, w4x, w4o1, w4o2, w4o3,
                w5x, w5o1, w5o2, w5o3, w5o4, b_ref, out_ref, x_vmem, dma_sem,
                *, tile: int, channels: int, growth: int):
    t, c, g = tile, channels, growth

    win = t + 2 * HALO + _ALIGN_PAD
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    copy = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(ti * t, win), pl.ds(tj * t, win), :],
        x_vmem, dma_sem)
    copy.start()
    copy.wait()
    x = x_vmem[:t + 2 * HALO, :t + 2 * HALO, :]       # (t+10, t+10, 128)

    b = b_ref[...]

    o1 = _lrelu(_conv_tile(x, w1x[...], t + 8)
                + b[0:1, :g].astype(jnp.bfloat16))
    o2 = _lrelu(_crop(_conv_tile(x, w2x[...], t + 8), 1, t + 6)
                + _conv_tile(o1, w2o1[...], t + 6)
                + b[1:2, :g].astype(jnp.bfloat16))
    o3 = _lrelu(_crop(_conv_tile(x, w3x[...], t + 8), 2, t + 4)
                + _crop(_conv_tile(o1, w3o1[...], t + 6), 1, t + 4)
                + _conv_tile(o2, w3o2[...], t + 4)
                + b[2:3, :g].astype(jnp.bfloat16))
    o4 = _lrelu(_crop(_conv_tile(x, w4x[...], t + 8), 3, t + 2)
                + _crop(_conv_tile(o1, w4o1[...], t + 6), 2, t + 2)
                + _crop(_conv_tile(o2, w4o2[...], t + 4), 1, t + 2)
                + _conv_tile(o3, w4o3[...], t + 2)
                + b[3:4, :g].astype(jnp.bfloat16))
    o5 = (_crop(_conv_tile(x, w5x[...], t + 8), 4, t)
          + _crop(_conv_tile(o1, w5o1[...], t + 6), 3, t)
          + _crop(_conv_tile(o2, w5o2[...], t + 4), 2, t)
          + _crop(_conv_tile(o3, w5o3[...], t + 2), 1, t)
          + _conv_tile(o4, w5o4[...], t)
          + b[4:5, :c].astype(jnp.bfloat16))

    out_ref[0] = (o5 * jnp.asarray(0.2, o5.dtype)
                  + _crop(x, HALO, t)[:, :, :c])


def pack_rdb_weights(kernels: Sequence[jnp.ndarray],
                     biases: Sequence[jnp.ndarray], channels: int, growth: int):
    """(k1..k5 HWIO, b1..b5) -> 15 per-(source, consumer) tap-major weights
    (x-source weights zero-padded to 128 input lanes) + (5, max-width) bias."""
    c, g = channels, growth
    k1, k2, k3, k4, k5 = kernels

    def taps(w, pad_to=None):
        w = w.reshape(9, w.shape[2], w.shape[3])
        if pad_to is not None and w.shape[1] < pad_to:
            w = jnp.pad(w, ((0, 0), (0, pad_to - w.shape[1]), (0, 0)))
        return w.astype(jnp.bfloat16)

    weights = (
        taps(k1, _LANE),                                    # w1x
        taps(k2[:, :, :c], _LANE), taps(k2[:, :, c:]),      # w2x,  w2o1
        taps(k3[:, :, :c], _LANE), taps(k3[:, :, c:c + g]),
        taps(k3[:, :, c + g:]),                             # w3x, w3o1, w3o2
        taps(k4[:, :, :c], _LANE), taps(k4[:, :, c:c + g]),
        taps(k4[:, :, c + g:c + 2 * g]), taps(k4[:, :, c + 2 * g:]),
        taps(k5[:, :, :c], _LANE), taps(k5[:, :, c:c + g]),
        taps(k5[:, :, c + g:c + 2 * g]), taps(k5[:, :, c + 2 * g:c + 3 * g]),
        taps(k5[:, :, c + 3 * g:]),
    )
    width = max(c, g)
    bias = jnp.zeros((5, width), jnp.float32)
    for i, bb in enumerate(biases):
        bias = bias.at[i, :bb.shape[0]].set(bb.astype(jnp.float32))
    return weights + (bias,)


@functools.partial(jax.jit, static_argnames=("tile",))
def fused_rdb(x: jnp.ndarray, packed, tile: int = 32) -> jnp.ndarray:
    """Apply one fused RDB to (B, H, W, C) input (H, W % tile == 0)."""
    *weights, bias = packed
    b, h, w, c = x.shape
    g = weights[2].shape[-1]  # w2o1 output width == growth

    x = x.astype(jnp.bfloat16)
    xp = jnp.pad(x, ((0, 0), (HALO, HALO + _ALIGN_PAD),
                     (HALO, HALO + _ALIGN_PAD), (0, max(0, _LANE - c))))

    grid = (b, h // tile, w // tile)
    kernel = functools.partial(_rdb_kernel, tile=tile, channels=c, growth=g)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.bfloat16),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 16,
        out_specs=pl.BlockSpec((1, tile, tile, c),
                               lambda bi, ti, tj: (bi, ti, tj, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * HALO + _ALIGN_PAD,
                        tile + 2 * HALO + _ALIGN_PAD, _LANE), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            # the unrolled 15-conv chain keeps many intermediates live; give
            # Mosaic's stack allocator the full VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xp, *weights, bias)
