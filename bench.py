"""Flagship benchmark: x4 SR throughput of the 23-RRDB generator on one chip.

Prints ONE JSON line:
  {"metric": "x4_sr_output_megapixels_per_sec_per_chip", "value": N,
   "unit": "MP/s", "vs_baseline": R}

Methodology: bf16 generator (23 RRDBs, 64ch — the reference architecture,
/root/reference/model.py:206-275), 256x256 LR inputs -> 1024x1024 outputs.
Timing uses a CHAINED jitted fori_loop (iteration i+1 consumes a slice of
iteration i's output) with a single final scalar fetch: this forces serial
device execution and is robust to async-dispatch / RPC-relay artifacts that
make per-call wall timing unreliable on tunneled TPUs.

The reference publishes no speed numbers (BASELINE.md).  ``vs_baseline`` is
against an estimated 10 MP/s for the reference torch stack on one A100
(fp16 autocast): the model costs ~2.24 TFLOP per output megapixel (counted
from the conv shapes) and community A100 timings for RRDB x4 inference land
around 0.4-0.5 s for a 512->2048 upscale (~8-10 MP/s, ~7% tensor-core
utilization — the 32-out-channel dense convs underutilize wide MMA units on
every accelerator).  vs_baseline > 1 means faster than the reference stack
per chip.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_BASELINE_MP_PER_S = 10.0


def measure(batch: int, lr_size: int, iters: int) -> float:
    from real_esrgan_tpu.models import Generator

    model = Generator(upscale_factor=4, num_rrdb=23, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]

    @jax.jit
    def chained(params, x, n):
        def body(i, x):
            out = model.apply({"params": params}, x)
            # feed a slice of the output back in: forces serial execution
            return out[:, :lr_size, :lr_size, :] * 0.999 + 0.0005

        return jax.lax.fori_loop(0, n, body, x)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, lr_size, lr_size, 3)), jnp.float32)

    float(chained(params, x, 1)[0, 0, 0, 0])  # compile + warmup
    t0 = time.perf_counter()
    float(chained(params, x, iters)[0, 0, 0, 0])
    dt = time.perf_counter() - t0

    out_mp = batch * (lr_size * 4) ** 2 / 1e6
    return out_mp * iters / dt


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--lr-size", type=int, default=256)
    p.add_argument("--iters", type=int, default=12)
    a = p.parse_args()
    mp_per_s = measure(a.batch, a.lr_size, a.iters)
    print(json.dumps({
        "metric": "x4_sr_output_megapixels_per_sec_per_chip",
        "value": round(mp_per_s, 3),
        "unit": "MP/s",
        "vs_baseline": round(mp_per_s / A100_BASELINE_MP_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
