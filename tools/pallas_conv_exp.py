"""Pallas experiment: 3x3 conv as lane-packed patch matrix + 3 MXU dots.

Validates the round-2 fused-RDB design on its riskiest primitives before the
full kernel is built:

* patch build: P[:, dx*C:(dx+1)*C] = x[:, dx:dx+W, :] reshaped (rows*W, C)
  (three sublane-shift + lane-offset writes — the only relayouts);
* conv: out_rows = sum_dy P[dy*W : dy*W + M, :] @ K_dy  (dy slices of the
  flattened patch are sublane-aligned because W % 16 == 0 -> free).

Compares numerics + chained throughput vs the XLA conv on the real TPU.
Usage: python tools/pallas_conv_exp.py [--batch 8 --size 256 --tile 32]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(x_hbm, w_ref, out_ref, x_vmem, patch, dma_sem, *,
                 tile: int, width: int, cin: int, cout: int, mode: str):
    """One (batch, h-tile) program: DMA strip, build patch, 3 dots."""
    rows = tile + 2
    bi = pl.program_id(0)
    ti = pl.program_id(1)

    copy = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(ti * tile, rows), :, :], x_vmem, dma_sem)
    copy.start()
    copy.wait()

    m = tile * width
    if mode == "dma":
        out_ref[0] = jnp.broadcast_to(
            x_vmem[0:1, 0:1, 0:1], (tile, width, cout)).astype(jnp.bfloat16)
        return

    if mode != "dots":
        # patch: (rows*width, 3*cin); band dx holds x[:, dx:dx+width, :cin]
        for dx in range(3):
            band = x_vmem[:, dx:dx + width, :cin].reshape(rows * width, cin)
            patch[:, dx * cin:(dx + 1) * cin] = band

    if mode == "patch":
        out_ref[0] = patch[pl.ds(0, m), :cout].reshape(tile, width, cout)
        return

    acc = jnp.zeros((m, cout), jnp.float32)
    for dy in range(3):
        acc = acc + jnp.dot(patch[pl.ds(dy * width, m), :], w_ref[dy],
                            preferred_element_type=jnp.float32)
    out_ref[0] = acc.astype(jnp.bfloat16).reshape(tile, width, cout)


@functools.partial(jax.jit, static_argnames=("tile", "mode"))
def pallas_conv(x, w, tile: int = 32, mode: str = "full"):
    """'same' 3x3 conv, NHWC bf16.  x: (B, H, W, C); w: (3, 3, C, Cout)."""
    b, h, width, cin = x.shape
    cout = w.shape[-1]
    assert h % tile == 0 and width % 16 == 0

    # W pad: 1 halo each side, then up to a multiple of 8 (DMA slice widths
    # must be sublane-aligned)
    wpad = (-(width + 2) % 8) + 1
    cpad = max(0, 128 - cin)  # DMA lane slices must be 128-aligned
    xp = jnp.pad(x.astype(jnp.bfloat16),
                 ((0, 0), (1, 1), (1, wpad), (0, cpad)))
    # weights: (3 dy, 3*cin, cout) — band dx of the patch pairs with w[dy, dx]
    wm = w.astype(jnp.bfloat16).transpose(0, 1, 2, 3).reshape(3, 3 * cin, cout)

    kernel = functools.partial(_conv_kernel, tile=tile, width=width,
                               cin=cin, cout=cout, mode=mode)
    rows = tile + 2
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, width, cout), jnp.bfloat16),
        grid=(b, h // tile),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tile, width, cout),
                               lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, width + 1 + wpad, max(cin, 128)), jnp.bfloat16),
            pltpu.VMEM((rows * width, 3 * cin), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, wm)


def bench_mosaic_mm(m: int, k: int, n: int, iters: int, grid_m: int = 8192,
                    acc32: bool = True):
    """Pure Mosaic matmul throughput at (m, k) @ (k, n), VMEM-blocked."""

    def kern(a_ref, b_ref, o_ref):
        d = jnp.dot(a_ref[...], b_ref[...],
                    preferred_element_type=jnp.float32 if acc32 else jnp.bfloat16)
        o_ref[...] = d.astype(jnp.bfloat16)

    a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16) * 0.05

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
            grid=(m // grid_m,),
            in_specs=[pl.BlockSpec((grid_m, k), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((k, n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((grid_m, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(a, b)

    def step(v):
        out = run(v, b)
        reps = -(-k // n)
        return jnp.tile(out, (1, reps))[:, :k] * jnp.asarray(0.3, v.dtype)

    dt = _chain_time(step, a, iters)
    tf = 2 * m * k * n / dt / 1e12
    print(f"mosaic mm ({m}x{k})@({k}x{n}) gm={grid_m} acc32={acc32}: "
          f"{dt*1e3:7.3f} ms  {tf:6.1f} TF/s")


def bench_mosaic_mm_vmem(m: int, k: int, n: int, iters: int, reps: int = 32):
    """MXU throughput of a VMEM-resident (m,k)@(k,n) dot repeated in-kernel
    (no HBM in the loop — isolates Mosaic's matmul codegen)."""

    def kern(a_ref, b_ref, o_ref):
        def body(i, acc):
            return acc + jnp.dot(a_ref[...], b_ref[...],
                                 preferred_element_type=jnp.float32)
        acc = jax.lax.fori_loop(0, reps, body,
                                jnp.zeros((m, n), jnp.float32))
        o_ref[...] = acc.astype(jnp.bfloat16)

    a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16) * 0.01

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)

    def step(v):
        out = run(v, b)
        reps_t = -(-k // n)
        return jnp.tile(out, (1, reps_t))[:m, :k] * jnp.asarray(1e-3, v.dtype)

    dt = _chain_time(step, a, iters)
    tf = 2 * m * k * n * reps / dt / 1e12
    print(f"mosaic mm-vmem ({m}x{k})@({k}x{n}) reps={reps}: "
          f"{dt*1e3:7.3f} ms  {tf:6.1f} TF/s")
    return tf


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _chain_time(step_fn, x, iters):
    @jax.jit
    def chained(x, n):
        return jax.lax.fori_loop(0, n, lambda i, v: step_fn(v), x)

    float(jnp.sum(chained(x, 1)))
    t0 = time.perf_counter()
    float(jnp.sum(chained(x, iters)))
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--cin", type=int, default=64)
    p.add_argument("--cout", type=int, default=192)
    p.add_argument("--tile", type=int, default=32)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--mm", action="store_true",
                   help="only run the pure Mosaic matmul probes")
    p.add_argument("--gate", action="store_true",
                   help="one-command toolchain re-probe (docs/ROADMAP.md): "
                        "measures Mosaic mm-vmem at the fused-RDB shapes and "
                        "prints a JSON verdict; if it ever exceeds the "
                        "threshold, the parked fused-RDB kernel design "
                        "unparks (round-3 measurement: ~48 TF/s, 4x below "
                        "the XLA conv path at these shapes)")
    p.add_argument("--gate-threshold", type=float, default=100.0)
    a = p.parse_args()

    if a.gate:
        import json

        # The two shapes that dominate a fused-RDB dot chain: the 5-conv
        # dense-growth matmul (k=192) and the source-packed wide one (k=576).
        tfs = [bench_mosaic_mm_vmem(8192, 192, 192, a.iters),
               bench_mosaic_mm_vmem(8192, 576, 192, a.iters)]
        best = max(tfs)
        unparked = best >= a.gate_threshold
        print(json.dumps({
            "gate": "mosaic_mm_vmem_tflops", "value": round(best, 1),
            "threshold": a.gate_threshold, "unparked": unparked,
            "note": ("fused-RDB pallas design UNPARKS: Mosaic matmul codegen "
                     "now competitive — revisit ops/pallas_rdb.py"
                     if unparked else
                     "parked: XLA conv path remains the ceiling")}))
        return

    if a.mm:
        for m, k_n in ((8192, (192, 192)), (8192, (576, 192)),
                       (8192, (96, 160)), (8192, (512, 512)),
                       (2048, (192, 192))):
            bench_mosaic_mm_vmem(m, k_n[0], k_n[1], a.iters)
        return

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (a.batch, a.size, a.size, a.cin), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, a.cin, a.cout),
                          jnp.float32) * 0.05

    got = np.asarray(pallas_conv(x, w, tile=a.tile), np.float32)
    want = np.asarray(xla_conv(x, w), np.float32)
    err = np.max(np.abs(got - want))
    print(f"max |pallas - xla| = {err:.5f}  (bf16 inputs)")
    assert err < 0.15, "numerics mismatch"

    flops = 2 * 9 * a.cin * a.cout * a.batch * a.size ** 2

    def step_x(v):
        out = xla_conv(v, w)
        return out[..., :a.cin] * jnp.asarray(0.3, v.dtype)

    dt_x = _chain_time(step_x, x, a.iters)
    print(f"xla    conv {a.cin}->{a.cout}: {dt_x*1e3:7.3f} ms  "
          f"{flops/dt_x/1e12:6.1f} TF/s")

    for mode in ("full", "dots", "patch", "dma"):
        def step_p(v):
            out = pallas_conv(v, w, tile=a.tile, mode=mode)
            return out[..., :a.cin] * jnp.asarray(0.3, v.dtype)

        dt_p = _chain_time(step_p, x, a.iters)
        print(f"pallas[{mode:5s}] tile={a.tile}: {dt_p*1e3:7.3f} ms  "
              f"{flops/dt_p/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
