"""Build the two-photo in-env quality dataset with held-out eval regions.

The build environment has exactly two real photographs (no network egress,
so DIV2K cannot be fetched): the 2 MP outdoor tree photo
(tests/data/tree_sr.png) and matplotlib's 0.3 MP indoor Grace Hopper
portrait.  Training a model on crops of ONE photo bakes that photo's color
statistics into the generator (measured: +0.08-0.11 global channel shift on
the unseen photo, PSNR 15.9 dB vs bicubic 24.7 — docs/PARITY.md), so the
in-env quality runs train on spatially disjoint crops of BOTH photos and
evaluate on held-out regions the trainer never saw:

  tree   train: rows 0:512 x cols 512:2048  +  rows 512:1024 x cols 0:2048
         eval:  rows 0:512 x cols 0:512     (top-left 512x512)
  hopper train: rows 0:400                  (400x512)
         eval:  rows 400:600                (bottom 200x512 strip)

Hopper train crops are file-replicated (--hopper-repeat) so the minority
photo is ~1/3 of each epoch.  Eval pairs are MATLAB-bicubic LRbicx4/GTmod4
(scripts/make_lr.py), PSNR-ready for scripts/eval_pair.py.

    python tools/make_inenv_dataset.py --out data/InEnv2
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOPPER_SRC = ("/opt/venv/lib/python3.12/site-packages/matplotlib/mpl-data/"
              "sample_data/grace_hopper.jpg")


def sliding_crops(image: np.ndarray, size: int, step: int):
    h, w = image.shape[:2]
    for top in list(range(0, h - size + 1, step)) or [0]:
        for left in list(range(0, w - size + 1, step)) or [0]:
            yield image[top:top + size, left:left + size]


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--out", default="data/InEnv2")
    p.add_argument("--tree", default="tests/data/tree_sr.png")
    p.add_argument("--hopper", default=HOPPER_SRC)
    p.add_argument("--crop-size", type=int, default=400)
    p.add_argument("--tree-step", type=int, default=48)
    p.add_argument("--hopper-step", type=int, default=8)
    p.add_argument("--hopper-repeat", type=int, default=6)
    a = p.parse_args(argv)

    tree = cv2.imread(a.tree)  # BGR; crops stay BGR like prepare_dataset.py
    hopper = cv2.imread(a.hopper)
    assert tree is not None and hopper is not None

    train_dir = os.path.join(a.out, "train")
    eval_src = os.path.join(a.out, "eval_src")
    shutil.rmtree(a.out, ignore_errors=True)
    os.makedirs(train_dir)
    os.makedirs(eval_src)

    n = 0
    train_regions = [("tree_a", tree[0:512, 512:2048]),
                     ("tree_b", tree[512:1024, 0:2048])]
    for name, region in train_regions:
        for crop in sliding_crops(region, a.crop_size, a.tree_step):
            n += 1
            cv2.imwrite(os.path.join(train_dir, f"{name}_{n:04d}.png"), crop)
    n_tree = n
    hopper_crops = list(sliding_crops(hopper[0:400], a.crop_size,
                                      a.hopper_step))
    for rep in range(a.hopper_repeat):
        for i, crop in enumerate(hopper_crops):
            n += 1
            cv2.imwrite(os.path.join(train_dir, f"hopper_r{rep}_{i:04d}.png"),
                        crop)
    print(f"train crops: {n_tree} tree + {n - n_tree} hopper "
          f"({len(hopper_crops)} unique x{a.hopper_repeat}) = {n}")

    cv2.imwrite(os.path.join(eval_src, "tree_heldout.png"), tree[0:512, 0:512])
    cv2.imwrite(os.path.join(eval_src, "hopper_heldout.png"),
                hopper[400:600, 0:512])

    from scripts.make_lr import main as make_lr_main

    make_lr_main(["--gt-dir", eval_src, "--output-dir",
                  os.path.join(a.out, "eval"), "--scale", "4", "--cpu"])
    print(f"dataset at {a.out}: train/ + eval/{{GTmod4,LRbicx4}}")


if __name__ == "__main__":
    main()
