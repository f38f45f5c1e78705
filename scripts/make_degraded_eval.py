"""Synthesize an in-distribution degraded eval set from held-out GT images.

Applies the SAME fused two-stage degradation pipeline the trainers use
(``ops/degradation.degrade`` — the TPU re-design of the reference's
train_realesrnet.py:258-377 prelude) to tiles of held-out ground-truth
images, writing aligned (LR, HR) pairs to ``<out>/LRx{scale}`` and
``<out>/GTmod{scale}``.

Why this tool exists: the reference evaluates blind SR with NIQE only,
because REAL degraded inputs have no ground truth.  Synthesizing the
degradation keeps the ground truth, so held-out PSNR becomes measurable for
the input regime the model is actually trained on (blurred / noisy /
JPEG-compressed), not just clean bicubic LR.  Pair with::

    python scripts/make_degraded_eval.py --gt-dir data/InEnv2/eval_src \
        --output-dir data/InEnv2/eval_degraded --seed 7
    python scripts/eval_pair.py --weights results/<exp>/g_best \
        --lr-dir data/InEnv2/eval_degraded/LRx4 \
        --hr-dir data/InEnv2/eval_degraded/GTmod4
    python scripts/eval_pair.py --bicubic ...     # the no-model baseline

Each tile draws its own per-sample degradation (kernels, noise, JPEG
quality) and each batch its own per-batch choices (resize kind/scale,
noise family), exactly like a training step — so the set spans the
severity distribution rather than one fixed corruption.
"""

from __future__ import annotations

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--gt-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--hr-size", type=int, default=400,
                   help="tile size cut from each GT image (degradation "
                        "pipeline input size)")
    p.add_argument("--crop-size", type=int, default=256,
                   help="HR size of each written pair (centre of the tile "
                        "after degradation)")
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--cpu", action="store_true")
    a = p.parse_args(argv)

    if a.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import numpy as np

    from real_esrgan_tpu.configuration import (
        DegradationConfig, KernelSynthesisConfig, PipelineGeometry,
    )
    from real_esrgan_tpu.ops.degradation import degrade
    from real_esrgan_tpu.utils.imgio import load_image_rgb, natsorted_files, \
        save_image_rgb

    geo = PipelineGeometry(hr_size=a.hr_size, crop_size=a.crop_size,
                           scale=a.scale)
    kcfg = KernelSynthesisConfig()
    dcfg = DegradationConfig()

    lr_dir = os.path.join(a.output_dir, f"LRx{a.scale}")
    hr_dir = os.path.join(a.output_dir, f"GTmod{a.scale}")
    os.makedirs(lr_dir, exist_ok=True)
    os.makedirs(hr_dir, exist_ok=True)

    tiles, names = [], []
    for path in natsorted_files(a.gt_dir):
        img = load_image_rgb(path)                      # float32 [0,1] HWC
        stem = os.path.splitext(os.path.basename(path))[0]
        h, w = img.shape[:2]
        idx = 0
        for y in range(0, h - a.hr_size + 1, a.hr_size):
            for x in range(0, w - a.hr_size + 1, a.hr_size):
                tile = img[y:y + a.hr_size, x:x + a.hr_size]
                tiles.append((tile * 255.0 + 0.5).astype(np.uint8))
                names.append(f"{stem}_{idx:03d}")
                idx += 1
        if idx == 0:
            print(f"skipping {path}: smaller than --hr-size {a.hr_size}")

    if not tiles:
        raise SystemExit("no tiles produced — images smaller than --hr-size?")

    # augment=False: pairs must stay in the source orientation so a human
    # can compare them against the GT photo; degradations still randomize.
    fn = jax.jit(degrade, static_argnames=(
        "geo", "kcfg", "dcfg", "augment", "up1", "up2"))
    coin = random.Random(a.seed)
    root = jax.random.key(a.seed)

    written = 0
    for start in range(0, len(tiles), a.batch_size):
        batch = tiles[start:start + a.batch_size]
        pad = a.batch_size - len(batch)           # reuse one compiled program
        hr_uint8 = np.stack(batch + batch[:1] * pad)
        up1 = coin.random() < dcfg.resize_probs1[0]
        up2 = coin.random() < dcfg.resize_probs2[0]
        key = jax.random.fold_in(root, start)
        lr, hr = fn(key, hr_uint8, geo, kcfg, dcfg, augment=False,
                    up1=up1, up2=up2)
        lr = np.clip(np.asarray(lr), 0.0, 1.0)
        hr = np.clip(np.asarray(hr), 0.0, 1.0)
        for i, name in enumerate(names[start:start + a.batch_size]):
            save_image_rgb(os.path.join(lr_dir, f"{name}.png"), lr[i])
            save_image_rgb(os.path.join(hr_dir, f"{name}.png"), hr[i])
            written += 1
    print(f"wrote {written} degraded (LR, HR) pairs to {a.output_dir} "
          f"(LR {a.crop_size // a.scale}px, HR {a.crop_size}px, "
          f"seed {a.seed})")


if __name__ == "__main__":
    main()
