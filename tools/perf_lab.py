"""Perf lab: micro-benchmarks for the RDB hot loop on the real TPU.

Methodology matches bench.py: a CHAINED jitted fori_loop (iteration i+1
consumes iteration i's output — the RDB is shape-preserving so chaining is
exact) with one final scalar fetch, robust to the relay's dispatch latency.

Experiments (run: python tools/perf_lab.py <name> [--batch 8 --size 256]):
  peak        big bf16 matmul -> measured MXU ceiling (TF/s)
  rdb         packed XLA RDB (the production path)      [ms/RDB, TF/s]
  rdb_naive   unpacked 5-conv concat RDB                [ms/RDB, TF/s]
  rdb_im2col  9-shift im2col + single K=576 matmul RDB  [ms/RDB, TF/s]
  gen         full 23-RRDB generator                    [MP/s]
  all         everything above
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

C, G = 64, 32
# FLOPs per pixel per RDB: 2 * 9 * (64*32 + 96*32 + 128*32 + 160*32 + 192*64)
RDB_FLOPS_PER_PX = 2 * 9 * (C * G + (C + G) * G + (C + 2 * G) * G
                            + (C + 3 * G) * G + (C + 4 * G) * C)


def _chain_time(step_fn, x, iters: int, warmup: int = 1) -> float:
    """Seconds per iteration of step_fn chained on device."""

    @jax.jit
    def chained(x, n):
        return jax.lax.fori_loop(0, n, lambda i, v: step_fn(v), x)

    float(jnp.sum(chained(x, warmup)))  # compile + warmup
    t0 = time.perf_counter()
    float(jnp.sum(chained(x, iters)))
    return (time.perf_counter() - t0) / iters


def _rand_weights(key):
    ks = jax.random.split(key, 10)
    shapes = [(3, 3, C, G), (3, 3, C + G, G), (3, 3, C + 2 * G, G),
              (3, 3, C + 3 * G, G), (3, 3, C + 4 * G, C)]
    kernels = [jax.random.normal(ks[i], s, jnp.float32) * 0.05
               for i, s in enumerate(shapes)]
    biases = [jnp.zeros((s[-1],), jnp.float32) for s in shapes]
    return kernels, biases


def _conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _lrelu(x):
    return jnp.where(x > 0, x, 0.2 * x)


def rdb_naive(kernels, biases, x):
    k1, k2, k3, k4, k5 = kernels
    b1, b2, b3, b4, b5 = [b.astype(x.dtype) for b in biases]
    o1 = _lrelu(_conv(x, k1) + b1)
    o2 = _lrelu(_conv(jnp.concatenate([x, o1], -1), k2) + b2)
    o3 = _lrelu(_conv(jnp.concatenate([x, o1, o2], -1), k3) + b3)
    o4 = _lrelu(_conv(jnp.concatenate([x, o1, o2, o3], -1), k4) + b4)
    o5 = _conv(jnp.concatenate([x, o1, o2, o3, o4], -1), k5) + b5
    return o5 * jnp.asarray(0.2, x.dtype) + x


def _pack_source_major(kernels):
    """As models/rrdbnet.py packed path: one conv per SOURCE."""
    k1, k2, k3, k4, k5 = kernels
    w_x = jnp.concatenate([k1, k2[:, :, :C], k3[:, :, :C], k4[:, :, :C],
                           k5[:, :, :C]], -1)
    w_o1 = jnp.concatenate([k2[:, :, C:], k3[:, :, C:C + G],
                            k4[:, :, C:C + G], k5[:, :, C:C + G]], -1)
    w_o2 = jnp.concatenate([k3[:, :, C + G:], k4[:, :, C + G:C + 2 * G],
                            k5[:, :, C + G:C + 2 * G]], -1)
    w_o3 = jnp.concatenate([k4[:, :, C + 2 * G:], k5[:, :, C + 2 * G:C + 3 * G]], -1)
    w_o4 = k5[:, :, C + 3 * G:]
    return w_x, w_o1, w_o2, w_o3, w_o4


def rdb_packed(kernels, biases, x):
    w_x, w_o1, w_o2, w_o3, w_o4 = _pack_source_major(kernels)
    b1, b2, b3, b4, b5 = [b.astype(x.dtype) for b in biases]
    base = _conv(x, w_x)
    o1 = _lrelu(base[..., :G] + b1)
    t2 = _conv(o1, w_o1)
    o2 = _lrelu(base[..., G:2 * G] + t2[..., :G] + b2)
    t3 = _conv(o2, w_o2)
    o3 = _lrelu(base[..., 2 * G:3 * G] + t2[..., G:2 * G] + t3[..., :G] + b3)
    t4 = _conv(o3, w_o3)
    o4 = _lrelu(base[..., 3 * G:4 * G] + t2[..., 2 * G:3 * G]
                + t3[..., G:2 * G] + t4[..., :G] + b4)
    t5 = _conv(o4, w_o4)
    o5 = (base[..., 4 * G:] + t2[..., 3 * G:] + t3[..., 2 * G:]
          + t4[..., G:] + t5 + b5)
    return o5 * jnp.asarray(0.2, x.dtype) + x


def _im2col(x):
    """(B, H, W, Cin) -> (B, H, W, 9*Cin) zero-padded 3x3 patches."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dy:dy + h, dx:dx + w, :]
            for dy in range(3) for dx in range(3)]
    return jnp.concatenate(cols, axis=-1)


def rdb_im2col(kernels, biases, x):
    """Each conv = one matmul with K = 9*Cin (full MXU depth)."""
    w_x, w_o1, w_o2, w_o3, w_o4 = _pack_source_major(kernels)
    b1, b2, b3, b4, b5 = [b.astype(x.dtype) for b in biases]

    def mm(t, w):  # w: (3, 3, Cin, Cout) -> (9*Cin, Cout)
        cols = _im2col(t)
        wm = w.reshape(-1, w.shape[-1]).astype(t.dtype)
        return jnp.einsum("bhwk,kn->bhwn", cols, wm)

    base = mm(x, w_x)
    o1 = _lrelu(base[..., :G] + b1)
    t2 = mm(o1, w_o1)
    o2 = _lrelu(base[..., G:2 * G] + t2[..., :G] + b2)
    t3 = mm(o2, w_o2)
    o3 = _lrelu(base[..., 2 * G:3 * G] + t2[..., G:2 * G] + t3[..., :G] + b3)
    t4 = mm(o3, w_o3)
    o4 = _lrelu(base[..., 3 * G:4 * G] + t2[..., 2 * G:3 * G]
                + t3[..., G:2 * G] + t4[..., :G] + b4)
    t5 = mm(o4, w_o4)
    o5 = (base[..., 4 * G:] + t2[..., 3 * G:] + t3[..., 2 * G:]
          + t4[..., G:] + t5 + b5)
    return o5 * jnp.asarray(0.2, x.dtype) + x


def run_peak(args):
    for n in (4096, 8192):
        a = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)
        scale = jnp.asarray(1.0 / np.sqrt(n), jnp.bfloat16)

        def step(v):
            # cheap rescale keeps the chain bounded (a ~ N(0,1) => v@a grows
            # ~sqrt(n)); no transcendentals polluting the measurement
            return (v @ a) * scale

        dt = _chain_time(step, a, args.iters)
        tf = 2 * n ** 3 / dt / 1e12
        print(f"peak: {n}^3 bf16 matmul  {dt*1e3:.3f} ms  -> {tf:.1f} TF/s")
    return tf


def _run_rdb(name, fn, args):
    kernels, biases = _rand_weights(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (args.batch, args.size, args.size, C), jnp.bfloat16)
    step = functools.partial(fn, kernels, biases)
    dt = _chain_time(step, x, args.iters)
    px = args.batch * args.size * args.size
    tf = RDB_FLOPS_PER_PX * px / dt / 1e12
    print(f"{name}: batch={args.batch} size={args.size}  "
          f"{dt*1e3:.3f} ms/RDB  -> {tf:.1f} TF/s")
    return dt


def run_gen(args):
    from real_esrgan_tpu.models import Generator

    model = Generator(upscale_factor=4, num_rrdb=args.rrdb, dtype=jnp.bfloat16,
                      subpixel=not args.no_subpixel)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]

    def step(x):
        out = model.apply({"params": params}, x)
        return out[:, :args.size, :args.size, :] * 0.999 + 0.0005

    x = jnp.asarray(np.random.default_rng(0).random(
        (args.batch, args.size, args.size, 3)), jnp.float32)
    dt = _chain_time(step, x, args.iters)
    mp = args.batch * (args.size * 4) ** 2 / 1e6
    print(f"gen: batch={args.batch} size={args.size}  {dt*1e3:.1f} ms  "
          f"-> {mp/dt:.2f} MP/s")


def _shift3(x):
    """(B,H,W,C) -> (B,H,W,3C): lane-concat of taps w-1, w, w+1 (zero pad)."""
    w = x.shape[2]
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    return jnp.concatenate([xp[:, :, 0:w], xp[:, :, 1:w + 1],
                            xp[:, :, 2:w + 2]], -1)


def _conv31(x3, k):
    """3x1 conv over dx-packed input == exact 3x3 conv, Cin tripled.

    k: (3, 3, Cin, Cout) original kernel."""
    cout = k.shape[-1]
    km = k.reshape(3, -1, cout)[:, None]  # (3, 1, 3*Cin, Cout), dx-major
    return jax.lax.conv_general_dilated(
        x3, km.astype(x3.dtype), (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def rdb_dxpack(kernels, biases, x):
    """Source-packed RDB where every conv is a 3x1 conv on dx-packed lanes."""
    w_x, w_o1, w_o2, w_o3, w_o4 = _pack_source_major(kernels)
    b1, b2, b3, b4, b5 = [b.astype(x.dtype) for b in biases]
    base = _conv31(_shift3(x), w_x)
    o1 = _lrelu(base[..., :G] + b1)
    t2 = _conv31(_shift3(o1), w_o1)
    o2 = _lrelu(base[..., G:2 * G] + t2[..., :G] + b2)
    t3 = _conv31(_shift3(o2), w_o2)
    o3 = _lrelu(base[..., 2 * G:3 * G] + t2[..., G:2 * G] + t3[..., :G] + b3)
    t4 = _conv31(_shift3(o3), w_o3)
    o4 = _lrelu(base[..., 3 * G:4 * G] + t2[..., 2 * G:3 * G]
                + t3[..., G:2 * G] + t4[..., :G] + b4)
    t5 = _conv31(_shift3(o4), w_o4)
    o5 = (base[..., 4 * G:] + t2[..., 3 * G:] + t3[..., 2 * G:]
          + t4[..., G:] + t5 + b5)
    return o5 * jnp.asarray(0.2, x.dtype) + x


def run_convscan31(args):
    """3x1 convs on dx-packed inputs at the RDB's shapes (incl. pack cost)."""
    for cin, cout in ((192, 192), (96, 160), (96, 128), (96, 96), (96, 64)):
        k = jax.random.normal(jax.random.PRNGKey(0), (3, 3, cin // 3, cout),
                              jnp.bfloat16) * 0.05
        x = jax.random.uniform(jax.random.PRNGKey(1),
                               (args.batch, args.size, args.size, cin // 3),
                               jnp.bfloat16)

        def step(v):
            out = _conv31(_shift3(v), k)
            return out[..., :cin // 3] * jnp.asarray(0.3, v.dtype)

        dt = _chain_time(step, x, args.iters)
        flops = 2 * 3 * cin * cout * args.batch * args.size ** 2
        print(f"conv3x1 {cin:4d}->{cout:4d} (+pack): {dt*1e3:7.3f} ms  "
              f"{flops/dt/1e12:6.1f} TF/s")


def run_convscan(args):
    """Efficiency curve of XLA 3x3 convs at the RDB's channel shapes."""
    for cin, cout in ((64, 64), (64, 192), (96, 192), (128, 128),
                      (64, 256), (128, 256), (256, 256)):
        k = jax.random.normal(jax.random.PRNGKey(0), (3, 3, cin, cout),
                              jnp.bfloat16) * 0.05
        x = jax.random.uniform(jax.random.PRNGKey(1),
                               (args.batch, args.size, args.size, cin),
                               jnp.bfloat16)

        def step(v):
            out = _conv(v, k)
            return out[..., :cin] * jnp.asarray(0.3, v.dtype)  # chain feed

        dt = _chain_time(step, x, args.iters)
        flops = 2 * 9 * cin * cout * args.batch * args.size ** 2
        print(f"conv3x3 {cin:4d}->{cout:4d}: {dt*1e3:7.3f} ms  "
              f"{flops/dt/1e12:6.1f} TF/s")


def run_matscan(args):
    """Same FLOP shapes as im2col'd RDB convs, as pure matmuls."""
    m = args.batch * args.size ** 2
    for k_dim, n_dim in ((576, 192), (288, 160), (288, 128), (288, 96),
                         (288, 64), (576, 64), (128, 128), (1152, 384)):
        a = jax.random.normal(jax.random.PRNGKey(0), (m, k_dim), jnp.bfloat16)
        b = jax.random.normal(jax.random.PRNGKey(1), (k_dim, n_dim),
                              jnp.bfloat16) * 0.05

        def step(v):
            out = v @ b
            reps = -(-k_dim // n_dim)
            return jnp.tile(out, (1, reps))[:, :k_dim] * jnp.asarray(0.3, v.dtype)

        dt = _chain_time(step, a, args.iters)
        flops = 2 * m * k_dim * n_dim
        print(f"matmul ({m}x{k_dim})@({k_dim}x{n_dim}): {dt*1e3:7.3f} ms  "
              f"{flops/dt/1e12:6.1f} TF/s")


def _chain_op_time(op, x0, iters, warmup=1):
    """Time an op with shape-changing output: serialize via a scalar carry."""

    @jax.jit
    def chained(x0, n):
        def body(i, c):
            out = op(x0 * (1.0 + c * jnp.float32(1e-6)))
            return jnp.mean(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(chained(x0, warmup))
    t0 = time.perf_counter()
    float(chained(x0, iters))
    return (time.perf_counter() - t0) / iters


def run_deg(args):
    """Per-stage cost of the on-device degradation pipeline (bs, hr=400)."""
    from real_esrgan_tpu.configuration import (
        DegradationConfig, KernelSynthesisConfig, PipelineGeometry,
    )
    from real_esrgan_tpu.ops.blur_kernels import random_first_order_kernel
    from real_esrgan_tpu.ops.degradation import _batched_resize, degrade
    from real_esrgan_tpu.ops.diffjpeg import diff_jpeg
    from real_esrgan_tpu.ops.filter2d import filter2d
    from real_esrgan_tpu.ops.noise import gaussian_noise, poisson_noise
    from real_esrgan_tpu.ops.usm import gaussian_kernel_1d, usm_sharpen

    b = args.batch
    geo = PipelineGeometry(hr_size=400, crop_size=256, scale=4)
    kcfg, dcfg = KernelSynthesisConfig(), DegradationConfig()
    c1, c2 = geo.canvas1, geo.canvas2
    key = jax.random.PRNGKey(0)
    print(f"geometry: hr={geo.hr_size} canvas1={c1} canvas2={c2} batch={b}")

    hr = jax.random.uniform(key, (b, 400, 400, 3))
    big = jax.random.uniform(key, (b, c1, c1, 3))
    small = jax.random.uniform(key, (b, c2, c2, 3))
    kernels = jax.vmap(lambda k: random_first_order_kernel(k, kcfg))(
        jax.random.split(key, b))
    usm_k = jnp.asarray(gaussian_kernel_1d(dcfg.usm_radius, 0.0))
    sig = jnp.full((b,), 15.0)
    gray = jnp.zeros((b,))
    q = jnp.full((b,), 60.0)
    ext_in = jnp.full((b,), 400, jnp.int32)
    ext_out = jnp.full((b,), 560, jnp.int32)
    ext2_in = jnp.full((b,), c1, jnp.int32)
    ext2_out = jnp.full((b,), geo.lr_size, jnp.int32)

    cases = {
        "full degrade": (lambda v: degrade(key, v, geo, kcfg, dcfg)[0], hr),
        "usm r51": (lambda v: usm_sharpen(v, usm_k, 0.5, 10.0), hr),
        "kernel synth x b": (lambda v: filter2d(v[:, :21, :21, :1] * 0 + 1,
            jax.vmap(lambda k: random_first_order_kernel(k, kcfg))(
                jax.random.split(key, b))), hr),
        "filter2d 21x21 @400": (lambda v: filter2d(v, kernels), hr),
        "resize1 area 400->560@608": (
            lambda v: _batched_resize(v, ext_in, ext_out, (c1, c1), 0), hr),
        "resize1 cubic 400->560@608": (
            lambda v: _batched_resize(v, ext_in, ext_out, (c1, c1), 2), hr),
        "resize2 cubic 608->100@c2": (
            lambda v: _batched_resize(v, ext2_in, ext2_out, (c2, c2), 2), big),
        "gauss noise @608": (lambda v: gaussian_noise(key, v, sig, gray), big),
        "poisson exact @608": (
            lambda v: poisson_noise(key, v, sig * 0.1, gray, False), big),
        "poisson approx @608": (
            lambda v: poisson_noise(key, v, sig * 0.1, gray, True), big),
        "diffjpeg @608": (lambda v: diff_jpeg(jnp.clip(v, 0, 1), q), big),
        "diffjpeg @c2": (lambda v: diff_jpeg(jnp.clip(v, 0, 1), q), small),
        "filter2d 21x21 @608": (lambda v: filter2d(v, kernels), big),
    }
    for name, (op, x0) in cases.items():
        try:
            dt = _chain_op_time(op, x0, args.iters)
            print(f"{name:30s}: {dt*1e3:8.3f} ms")
        except Exception as exc:  # keep the scan going
            print(f"{name:30s}: FAILED {type(exc).__name__}: {exc}")


EXPERIMENTS = {
    "deg": run_deg,
    "convscan": run_convscan,
    "matscan": run_matscan,
    "peak": run_peak,
    "rdb": lambda a: _run_rdb("rdb_packed", rdb_packed, a),
    "rdb_naive": lambda a: _run_rdb("rdb_naive", rdb_naive, a),
    "rdb_im2col": lambda a: _run_rdb("rdb_im2col", rdb_im2col, a),
    "rdb_dxpack": lambda a: _run_rdb("rdb_dxpack", rdb_dxpack, a),
    "convscan31": run_convscan31,
    "gen": run_gen,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("exp", choices=list(EXPERIMENTS) + ["all"])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--rrdb", type=int, default=23)
    p.add_argument("--no-subpixel", action="store_true")
    args = p.parse_args()
    if args.exp == "all":
        for name, fn in EXPERIMENTS.items():
            fn(args)
    else:
        EXPERIMENTS[args.exp](args)


if __name__ == "__main__":
    main()
