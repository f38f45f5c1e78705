"""Tiled-serving geometry sweep: find the best (tile, overlap, tile_batch).

The 2K->8K tiled-serving metric (bench.py --mode tiled) runs the SAME
network as flagship inference, so the gap between them (12.0 vs ~20 MP/s in
round 2) is pure geometry overhead:

  * halo fraction: only (core/tile)^2 of each tile's output is kept
    (core = tile - 2*overlap); tile=256/overlap=16 keeps 76.6%,
  * canvas waste: ny = ceil(H/core) rounds the canvas up (2048/224 -> 2240,
    +9.6% padded pixels),
  * tail-batch waste: the last tile batch repeats tiles when
    tile_batch does not divide ny*nx.

Geometries where core divides 2048 exactly (272/8 -> core 256, 64 tiles)
remove the canvas and tail waste entirely.  ``--seam`` additionally scores
each geometry's worst seam error against a whole-image forward on a 512^2
input, so overlap can be shrunk with evidence instead of faith.  (The
reference has no tiling at all — /root/reference/inference.py:40-53 feeds
whole images; overlap=8-10 is the community Real-ESRGAN serving default.)

Usage (on the TPU; each geometry costs one relay compile, ~2-3 min):
  python tools/tile_sweep.py                 # throughput sweep, 2K->8K
  python tools/tile_sweep.py --seam          # + seam-error check at 512^2
  python tools/tile_sweep.py --weights results/RealESRNet_baseline/g_last
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# (tile, overlap, tile_batch) candidates.  272/8 and 264/4 have core sizes
# (256) that divide 2048; 144/8 probes the small-tile regime (128px batches
# measured 19.5 MP/s in the flagship sweep); 256/16 is the round-2 default.
# Round-4 additions: core-512 tiles.  528/8/8 measured 18.2 MP/s (the new
# default); 528/8/4 under-fills the chip (12.4); 528/8/16, 272/8/32 and
# 1040/8/2 OOM the 16 GB HBM on the 2x-padded upsample conv temporaries
# (bf16[4160,2,8,523,64]: 4.15 G unpadded -> 8.3 G padded).
DEFAULT_COMBOS = (
    (256, 16, 8),    # round-2 default (the 12.0 MP/s configuration)
    (256, 16, 16),
    (256, 8, 16),
    (272, 8, 16),    # core 256: zero canvas waste, 64 tiles = 4 full batches
    (264, 4, 16),    # core 256, thinner halo
    (288, 16, 16),   # core 256, conservative halo
    (144, 8, 32),    # core 128: zero waste, small-tile regime
    (528, 8, 8),     # core 512: round-4 default, 94.0% halo-useful
)


def build_apply(weights: str | None, num_rrdb: int = 23):
    from real_esrgan_tpu.models import Generator

    model = Generator(upscale_factor=4, num_rrdb=num_rrdb, dtype=jnp.bfloat16)
    if weights:
        from real_esrgan_tpu.train.checkpoint import load_generator_params
        params = load_generator_params(weights, prefer_ema=True)
    else:
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 3)))["params"]
    return jax.jit(lambda p, x: model.apply({"params": p}, x)), params


def measure_geometry(apply_fn, params, in_size: int, tile: int, overlap: int,
                     tile_batch: int, iters: int) -> dict:
    from real_esrgan_tpu.parallel import tiling
    from real_esrgan_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh()
    core = tile - 2 * overlap
    ny = nx = math.ceil(in_size / core)
    n_batches = math.ceil(ny * nx / tile_batch)
    fn = tiling._build_tiled_fn(apply_fn, ny, nx, tile, overlap, tile_batch,
                                4, n_batches, batch_sharding(mesh))

    rng = np.random.default_rng(0)
    pad = 2 * overlap + ny * core - in_size
    padded = jnp.asarray(rng.random(
        (in_size + pad, in_size + pad, 3)).astype(np.float32))

    t0 = time.perf_counter()
    out = fn(params, padded)
    float(jnp.mean(out[:8, :8]))
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, padded)
        float(jnp.mean(out[:8, :8]))
    dt = time.perf_counter() - t0
    useful = (core / tile) ** 2 * (in_size / (ny * core)) ** 2 \
        * (ny * nx) / (n_batches * tile_batch)
    return {"tile": tile, "overlap": overlap, "tile_batch": tile_batch,
            "tiles": ny * nx, "batches": n_batches,
            "useful_frac": round(useful, 3),
            "mp_per_s": round((in_size * 4) ** 2 / 1e6 * iters / dt, 3),
            "compile_s": round(compile_s, 1)}


def stage_breakdown(apply_fn, params, in_size: int, tile: int, overlap: int,
                    tile_batch: int, iters: int) -> dict:
    """Per-stage residual table for one geometry (VERDICT r3 #4).

    Decomposes the tiled-vs-flagship gap into:
      * halo compute — the network runs on ``tile^2`` pixels but only
        ``core^2`` are kept: measured as ``raw_net_s`` (the same batched
        forwards with NO gather/stitch, tiles pre-materialized) scaled by
        ``useful_frac``;
      * gather + stitch + dispatch — ``tiled_s - raw_net_s``: the vmapped
        dynamic_slice tile gather, the on-device core stitch/transpose, and
        the lax.map batch loop, i.e. everything tiling adds beyond running
        the network.
    Both programs end in a tiny mean fetch so relay timing is trustworthy
    (chained compute + one scalar fetch, see bench.py docstring).
    """
    from real_esrgan_tpu.parallel import tiling
    from real_esrgan_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh()
    core = tile - 2 * overlap
    ny = nx = math.ceil(in_size / core)
    n_batches = math.ceil(ny * nx / tile_batch)
    sharding = batch_sharding(mesh)

    rng = np.random.default_rng(0)
    pad = 2 * overlap + ny * core - in_size
    padded = jnp.asarray(rng.random(
        (in_size + pad, in_size + pad, 3)).astype(np.float32))
    tiles = jnp.asarray(rng.random(
        (tile_batch, tile, tile, 3)).astype(np.float32))

    def raw_net(params, tiles):
        # same batch count and shapes as the tiled program, no tiling stages
        def body(carry, _):
            # carry-dependent input so XLA cannot hoist the (otherwise
            # loop-invariant) forward out of the scan and time one batch
            x = tiles + carry * jnp.float32(1e-30)
            if sharding is not None:
                x = jax.lax.with_sharding_constraint(x, sharding)
            sr = apply_fn(params, x)
            return carry + jnp.mean(sr, dtype=jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n_batches)
        return acc

    raw_fn = jax.jit(raw_net)
    tiled_fn = tiling._build_tiled_fn(apply_fn, ny, nx, tile, overlap,
                                      tile_batch, 4, n_batches, sharding)

    def timed(fn, *args, reduce=lambda o: float(jnp.mean(o[:8, :8]))):
        fn_out = fn(*args)  # compile
        reduce(fn_out)
        t0 = time.perf_counter()
        for _ in range(iters):
            reduce(fn(*args))
        return (time.perf_counter() - t0) / iters

    raw_s = timed(raw_fn, params, tiles, reduce=float)
    tiled_s = timed(tiled_fn, params, padded)

    useful = (core / tile) ** 2 * (in_size / (ny * core)) ** 2 \
        * (ny * nx) / (n_batches * tile_batch)
    out_mp = (in_size * 4) ** 2 / 1e6
    return {"tile": tile, "overlap": overlap, "tile_batch": tile_batch,
            "useful_frac": round(useful, 3),
            "raw_net_s": round(raw_s, 4),
            "tiled_s": round(tiled_s, 4),
            "gather_stitch_s": round(tiled_s - raw_s, 4),
            "halo_compute_s": round(raw_s * (1 - useful), 4),
            "tiled_mp_per_s": round(out_mp / tiled_s, 3),
            "net_only_mp_per_s": round(out_mp / raw_s, 3),
            "zero_overhead_mp_per_s": round(out_mp / (raw_s * useful), 3)}


def seam_error(apply_fn, params, tile: int, overlap: int, tile_batch: int,
               in_size: int = 512) -> dict:
    """max/mean abs difference, tiled vs whole-image forward, on real pixels
    scaled to 8-bit levels (255 * diff)."""
    from real_esrgan_tpu.parallel.tiling import tiled_upscale
    from real_esrgan_tpu.utils.imgio import load_image_rgb

    try:
        img = load_image_rgb("tests/data/tree_sr.png")[:in_size, :in_size]
        if img.shape[0] < in_size:  # pad up with reflect if the asset is small
            img = np.pad(img, ((0, in_size - img.shape[0]),
                               (0, in_size - img.shape[1]), (0, 0)), "reflect")
    except Exception:
        img = np.random.default_rng(0).random((in_size, in_size, 3)) \
            .astype(np.float32)

    whole = np.asarray(apply_fn(params, jnp.asarray(img)[None])[0], np.float32)
    tiled = tiled_upscale(apply_fn, params, np.asarray(img, np.float32),
                          scale=4, tile=tile, overlap=overlap,
                          tile_batch=tile_batch)
    diff = np.abs(whole - np.asarray(tiled, np.float32)) * 255.0

    # The image BORDER differs for a reason unrelated to overlap: the tiled
    # canvas is reflect-padded while the whole-image forward sees zero 'SAME'
    # padding, so border receptive fields legitimately disagree for any halo.
    # Interior stats isolate the actual seam truncation error.
    b = 64  # 16 input px * scale 4
    interior = diff[b:-b, b:-b]
    stats = lambda d: {"max": round(float(d.max()), 3),
                       "mean": round(float(d.mean()), 5),
                       "p999": round(float(np.quantile(d, 0.999)), 3)}
    return {"all_8bit": stats(diff), "interior_8bit": stats(interior)}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--in-size", type=int, default=2048)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--weights", default="",
                   help="checkpoint for realistic activations (seam check)")
    p.add_argument("--seam", action="store_true",
                   help="also score seam error vs whole-image at 512^2")
    p.add_argument("--stages", action="store_true",
                   help="per-stage residual table (halo compute vs "
                        "gather/stitch) instead of the plain throughput row")
    p.add_argument("--combos", default="",
                   help="override: 'tile,ov,batch;tile,ov,batch;...'")
    p.add_argument("--num-rrdb", type=int, default=23,
                   help="trunk depth (reduce for CPU smoke tests)")
    a = p.parse_args()

    combos = DEFAULT_COMBOS
    if a.combos:
        combos = tuple(tuple(int(v) for v in c.split(","))
                       for c in a.combos.split(";"))

    apply_fn, params = build_apply(a.weights or None, a.num_rrdb)
    for tile, ov, tb in combos:
        if a.stages:
            print(json.dumps(stage_breakdown(apply_fn, params, a.in_size,
                                             tile, ov, tb, a.iters)),
                  flush=True)
            continue
        row = measure_geometry(apply_fn, params, a.in_size, tile, ov, tb,
                               a.iters)
        if a.seam:
            row["seam"] = seam_error(apply_fn, params, tile, ov, tb)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
