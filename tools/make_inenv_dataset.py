"""Build the in-env quality dataset with held-out eval regions.

The build environment has no network egress (DIV2K cannot be fetched), so
this assembles every real photograph it can find: the 2 MP outdoor tree
photo (tests/data/tree_sr.png), matplotlib's 0.3 MP indoor Grace Hopper
portrait, and — with ``--textures`` — the photographic texture assets
bundled in site-packages (wood grain, marble, skin, grass, a 3 MP outdoor
skybox), ~10 distinct sources in total.  Training a model on crops of ONE
photo bakes that photo's color statistics into the generator (measured:
+0.08-0.11 global channel shift on the unseen photo, PSNR 15.9 dB vs
bicubic 24.7 — docs/PARITY.md), so the in-env quality runs train on
spatially disjoint crops of every source and evaluate on held-out regions
the trainer never saw:

  tree     train: rows 0:512 x cols 512:2048  +  rows 512:1024 x cols 0:2048
           eval:  rows 0:512 x cols 0:512     (top-left 512x512)
  hopper   train: rows 0:400                  (400x512)
           eval:  rows 400:600                (bottom 200x512 strip)
  textures train: rows 256:H                  (per image)
           eval:  rows 0:256                  (top strip; images too small
                                               to split train-only)

Hopper train crops are file-replicated (--hopper-repeat) so the minority
photo stays a meaningful share of each epoch.  Eval pairs are
MATLAB-bicubic LRbicx4/GTmod4 (scripts/make_lr.py), PSNR-ready for
scripts/eval_pair.py; eval_src/ feeds scripts/make_degraded_eval.py.

    python tools/make_inenv_dataset.py --out data/InEnv2
    python tools/make_inenv_dataset.py --out data/InEnv10 --textures
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

# Photographic texture assets bundled with simulator packages in this
# environment — real camera imagery (wood grain, marble, skin, grass,
# outdoor skybox), exactly the natural statistics SR training needs.
_SP = "/opt/venv/lib/python3.12/site-packages"
TEXTURE_SRCS = [
    ("wood", f"{_SP}/gymnasium_robotics/envs/assets/kitchen_franka/"
             "kitchen_assets/textures/wood1.png"),
    ("darkwood", f"{_SP}/gymnasium_robotics/envs/assets/adroit_hand/"
                 "resources/textures/darkwood.png"),
    ("skin", f"{_SP}/gymnasium_robotics/envs/assets/adroit_hand/"
             "resources/textures/skin.png"),
    ("dogskin", f"{_SP}/dm_control/suite/dog_assets/skin_texture.png"),
    ("marble", f"{_SP}/gymnasium_robotics/envs/assets/kitchen_franka/"
               "kitchen_assets/textures/white_marble_tile.png"),
    ("marble2", f"{_SP}/gymnasium_robotics/envs/assets/kitchen_franka/"
                "kitchen_assets/textures/white_marble_tile2.png"),
    ("skybox", f"{_SP}/dm_control/locomotion/arenas/assets/"
               "outdoor_natural/OutdoorSkybox2048.png"),
    ("grass", f"{_SP}/dm_control/locomotion/arenas/assets/"
              "outdoor_natural/OutdoorGrassFloorD.png"),
]


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
    p.add_argument("--textures", action="store_true",
                   help="also include the site-packages photographic "
                        "texture assets (TEXTURE_SRCS)")
    p.add_argument("--texture-step", type=int, default=128)
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

    if a.textures:
        eval_rows = 256
        for tex_name, path in TEXTURE_SRCS:
            img = cv2.imread(path)
            if img is None:
                print(f"texture {tex_name}: unreadable at {path}, skipped")
                continue
            if img.shape[0] - eval_rows >= a.crop_size:
                cv2.imwrite(os.path.join(eval_src,
                                         f"{tex_name}_heldout.png"),
                            img[0:eval_rows])
                region = img[eval_rows:]
            else:
                region = img  # too small to split: train-only
            n_before = n
            for crop in sliding_crops(region, a.crop_size, a.texture_step):
                n += 1
                cv2.imwrite(os.path.join(train_dir,
                                         f"{tex_name}_{n:04d}.png"), crop)
            held = "held-out top strip" if region is not img else "train-only"
            print(f"texture {tex_name}: {n - n_before} crops ({held})")

    from scripts.make_lr import main as make_lr_main

    make_lr_main(["--gt-dir", eval_src, "--output-dir",
                  os.path.join(a.out, "eval"), "--scale", "4", "--cpu"])
    print(f"dataset at {a.out}: train/ + eval/{{GTmod4,LRbicx4}}")


if __name__ == "__main__":
    main()
