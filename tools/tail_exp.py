"""Round-3 perf experiments: generator-tail conv4 variants + int8 at the
REAL packed-RDB shapes.

Run on the real chip:
    python tools/tail_exp.py --mode conv4
    python tools/tail_exp.py --mode int8

Timing methodology matches bench.py/perf_lab.py: chained jitted fori_loop
with a scalar carry + one final scalar fetch (trustworthy through the relay).

Context (docs/ROADMAP.md tail bisect): at bench shapes (bs8, 256 LR) the
tail is upsampling 9.6 ms, conv3 8.4 ms (~73 TF/s in-graph), conv4 12.4 ms
(Cout=3 -> MXU pads the output to 128 lanes: ~43x wasted lanes).  conv4
candidates here are exact-math reformulations that trade the lane padding
against extra input channels / repacks.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

B = 8


def _chain_op_time(op, x0, iters, warmup=1):
    @jax.jit
    def chained(x0, n):
        def body(i, c):
            out = op(x0 * (1.0 + c * jnp.bfloat16(1e-6)))
            return jnp.mean(out.astype(jnp.float32)).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, n, body, jnp.bfloat16(0))

    float(chained(x0, warmup))
    t0 = time.perf_counter()
    float(chained(x0, iters))
    return (time.perf_counter() - t0) / iters


def _conv(x, k, window=(1, 1), pad=((1, 1), (1, 1))):
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), window, pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def run_conv4(args):
    rng = np.random.default_rng(0)
    x4 = jnp.asarray(rng.random((B, 1024, 1024, 64)), jnp.bfloat16)
    x2 = jnp.asarray(rng.random((B, 512, 512, 256)), jnp.bfloat16)
    k43 = jnp.asarray(rng.random((3, 3, 64, 3)) * 0.05, jnp.float32)
    k22 = jnp.asarray(rng.random((2, 2, 256, 12)) * 0.05, jnp.float32)
    k33_64 = jnp.asarray(rng.random((3, 3, 64, 64)) * 0.05, jnp.float32)
    useful = 2 * 9 * 64 * 3 * B * 1024 * 1024

    cases = {
        # today's tail op: 3x3 64->3 at 4x res, f32 cast + clamp
        "conv4_base": lambda x: jnp.clip(
            _conv(x, k43).astype(jnp.float32), 0, 1),
        # same without the f32 cast (isolates cast+clamp cost)
        "conv4_bf16_out": lambda x: _conv(x, k43),
        # (2,2)-window pre-shuffle form: 256->12 at 2x res + depth-to-space
        "conv4_win22_preshuffle": lambda y: jnp.clip(rearrange(
            _conv(y, k22, (2, 2), ((1, 0), (1, 0))).astype(jnp.float32),
            "n h w (a b o) -> n (h a) (w b) o", a=2, b=2), 0, 1),
        # the repack a post-shuffle producer would need first
        "unshuffle_repack": lambda x: rearrange(
            x, "n (h a) (w b) c -> n h w (a b c)", a=2, b=2),
        # conv3 for the residual table
        "conv3_base": lambda x: jax.nn.leaky_relu(_conv(x, k33_64), 0.2),
    }
    for name, fn in cases.items():
        inp = x2 if "preshuffle" in name else x4
        dt = _chain_op_time(fn, inp, args.iters)
        print(f"{name:26s} {dt*1e3:8.3f} ms   "
              f"useful {useful/dt/1e12:6.2f} TF/s")


def run_nchw(args):
    """NCHW tail: with pixels on the MXU lane dim, Cout=3 pads only the
    sublane dim (3->8, 2.7x) instead of lanes (3->128, 43x)."""
    rng = np.random.default_rng(0)
    xh = jnp.asarray(rng.random((B, 1024, 1024, 64)), jnp.bfloat16)   # NHWC
    xc = jnp.asarray(rng.random((B, 64, 1024, 1024)), jnp.bfloat16)   # NCHW
    k33 = jnp.asarray(rng.random((64, 64, 3, 3)) * 0.05, jnp.bfloat16)  # OIHW
    k43 = jnp.asarray(rng.random((3, 64, 3, 3)) * 0.05, jnp.bfloat16)

    def conv_nchw(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    cases = {
        "conv3_nchw_pure": lambda x: jax.nn.leaky_relu(conv_nchw(x, k33), 0.2),
        "conv4_nchw_pure": lambda x: jnp.clip(
            conv_nchw(x, k43).astype(jnp.float32), 0, 1),
        # full tail drop-in: NHWC in -> transpose -> conv3+lrelu -> conv4
        # -> clamp -> NHWC out (what the Generator would actually run)
        "tail_nchw_chain": lambda x: jnp.clip(
            conv_nchw(jax.nn.leaky_relu(
                conv_nchw(jnp.transpose(x, (0, 3, 1, 2)), k33), 0.2),
                k43).astype(jnp.float32).transpose(0, 2, 3, 1), 0, 1),
        # today's NHWC tail for comparison, same chain
        "tail_nhwc_chain": lambda x: jnp.clip(_conv(
            jax.nn.leaky_relu(_conv(
                x, jnp.transpose(k33, (2, 3, 1, 0))), 0.2),
            jnp.transpose(k43, (2, 3, 1, 0))).astype(jnp.float32), 0, 1),
    }
    for name, fn in cases.items():
        inp = xh if "chain" in name else xc
        dt = _chain_op_time(fn, inp, args.iters)
        print(f"{name:22s} {dt*1e3:8.3f} ms")


def _quant(x):
    """Per-tensor symmetric int8 quantization of activations (the real
    serving cost: scale + clip + round + cast on every conv input)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32))) + 1e-8
    s = 127.0 / amax
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * s), -127, 127)
    return q.astype(jnp.int8), (1.0 / s).astype(jnp.float32)


def _conv_i8(xq, kq):
    return jax.lax.conv_general_dilated(
        xq, kq, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def run_int8(args):
    rng = np.random.default_rng(0)
    s = 256
    shapes = [(64, 192), (32, 160), (32, 128), (32, 96), (32, 64)]
    print(f"-- per-conv rates at bs{B}, {s}^2 (the packed-RDB shapes) --")
    for cin, cout in shapes:
        x = jnp.asarray(rng.random((B, s, s, cin)), jnp.bfloat16)
        k = jnp.asarray(rng.random((3, 3, cin, cout)) * 0.05, jnp.bfloat16)
        flops = 2 * 9 * cin * cout * B * s * s
        dt = _chain_op_time(lambda v, k=k: _conv(v, k), x, args.iters)
        xq = jnp.asarray((rng.random((B, s, s, cin)) * 100 - 50), jnp.int8)
        kq = jnp.asarray((rng.random((3, 3, cin, cout)) * 100 - 50), jnp.int8)

        def i8op(v, kq=kq):
            return _conv_i8(v, kq)

        dt8 = _chain_op_time_i8(i8op, xq, args.iters)
        print(f"{cin:3d}->{cout:3d}: bf16 {dt*1e3:7.3f} ms {flops/dt/1e12:6.1f} TF/s"
              f"   int8 {dt8*1e3:7.3f} ms {flops/dt8/1e12:6.1f} TOP/s")

    print(f"-- full packed RDB, bf16 vs int8-with-requant --")
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from perf_lab import _rand_weights, rdb_packed

    kernels, biases = _rand_weights(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.random((B, s, s, 64)), jnp.bfloat16)
    dt = _chain_op_time(
        lambda v: rdb_packed([k.astype(jnp.bfloat16) for k in kernels],
                             biases, v), x, args.iters)
    rdb_flops = 2 * 9 * (64 * 32 + 96 * 32 + 128 * 32 + 160 * 32
                         + 192 * 64) * B * s * s
    print(f"rdb_packed bf16:        {dt*1e3:7.3f} ms {rdb_flops/dt/1e12:6.1f} TF/s")

    kq = [jnp.clip(jnp.round(k * 1270), -127, 127).astype(jnp.int8)
          for k in kernels]
    kscale = [jnp.float32(1 / 1270)] * 5
    c, g = 64, 32
    w_x = jnp.concatenate([kq[0], kq[1][:, :, :c], kq[2][:, :, :c],
                           kq[3][:, :, :c], kq[4][:, :, :c]], -1)
    w_o1 = jnp.concatenate([kq[1][:, :, c:], kq[2][:, :, c:c + g],
                            kq[3][:, :, c:c + g], kq[4][:, :, c:c + g]], -1)
    w_o2 = jnp.concatenate([kq[2][:, :, c + g:], kq[3][:, :, c + g:c + 2 * g],
                            kq[4][:, :, c + g:c + 2 * g]], -1)
    w_o3 = jnp.concatenate([kq[3][:, :, c + 2 * g:],
                            kq[4][:, :, c + 2 * g:c + 3 * g]], -1)
    w_o4 = kq[4][:, :, c + 3 * g:]
    lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)  # noqa: E731

    def rdb_int8(x):
        xq, sx = _quant(x)
        base = _conv_i8(xq, w_x).astype(jnp.float32) * (sx * kscale[0])
        o1 = lrelu(base[..., :g])
        o1q, s1 = _quant(o1)
        t2 = _conv_i8(o1q, w_o1).astype(jnp.float32) * (s1 * kscale[1])
        o2 = lrelu(base[..., g:2 * g] + t2[..., :g])
        o2q, s2 = _quant(o2)
        t3 = _conv_i8(o2q, w_o2).astype(jnp.float32) * (s2 * kscale[2])
        o3 = lrelu(base[..., 2 * g:3 * g] + t2[..., g:2 * g] + t3[..., :g])
        o3q, s3 = _quant(o3)
        t4 = _conv_i8(o3q, w_o3).astype(jnp.float32) * (s3 * kscale[3])
        o4 = lrelu(base[..., 3 * g:4 * g] + t2[..., 2 * g:3 * g]
                   + t3[..., g:2 * g] + t4[..., :g])
        o4q, s4 = _quant(o4)
        t5 = _conv_i8(o4q, w_o4).astype(jnp.float32) * (s4 * kscale[4])
        o5 = (base[..., 4 * g:] + t2[..., 3 * g:] + t3[..., 2 * g:]
              + t4[..., g:] + t5)
        return (o5 * 0.2 + x.astype(jnp.float32)).astype(jnp.bfloat16)

    dt8 = _chain_op_time(rdb_int8, x, args.iters)
    print(f"rdb_packed int8+requant:{dt8*1e3:7.3f} ms {rdb_flops/dt8/1e12:6.1f} TOP/s")


def _chain_op_time_i8(op, x0, iters, warmup=1):
    @jax.jit
    def chained(x0, n):
        def body(i, c):
            out = op(jnp.clip(x0 + c, -127, 127).astype(jnp.int8))
            return jnp.sum(out) % 113

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    int(chained(x0, warmup))
    t0 = time.perf_counter()
    int(chained(x0, iters))
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=("conv4", "int8", "nchw"), required=True)
    p.add_argument("--iters", type=int, default=30)
    a = p.parse_args()
    {"conv4": run_conv4, "int8": run_int8, "nchw": run_nchw}[a.mode](a)


if __name__ == "__main__":
    main()
