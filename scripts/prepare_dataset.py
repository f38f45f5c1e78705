"""Sliding-window crop of HR images into training patches.

Counterpart of /root/reference/scripts/prepare_dataset.py: crops every image
in --images_dir into (--image_size)^2 patches with stride --step, writing
PNGs to --output_dir, parallelized with a process pool.
"""

from __future__ import annotations

import argparse
import multiprocessing
import os

import cv2
import numpy as np


def worker(args_tuple) -> int:
    image_path, output_dir, image_size, step, thresh_size = args_tuple
    image_name = os.path.splitext(os.path.basename(image_path))[0]
    image = cv2.imread(image_path, cv2.IMREAD_UNCHANGED)
    if image is None:
        return 0
    h, w = image.shape[:2]
    index = 0
    for top in list(np.arange(0, h - image_size + 1, step)) or [0]:
        for left in list(np.arange(0, w - image_size + 1, step)) or [0]:
            top, left = int(top), int(left)
            crop = image[top:top + image_size, left:left + image_size, ...]
            if crop.shape[0] < thresh_size or crop.shape[1] < thresh_size:
                continue
            index += 1
            out = os.path.join(output_dir, f"{image_name}_{index:04d}.png")
            cv2.imwrite(out, np.ascontiguousarray(crop))
    return index


def main(args) -> None:
    os.makedirs(args.output_dir, exist_ok=True)
    files = [os.path.join(args.images_dir, f)
             for f in sorted(os.listdir(args.images_dir))
             if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))]
    tasks = [(f, args.output_dir, args.image_size, args.step, args.thresh_size)
             for f in files]
    with multiprocessing.Pool(args.num_workers) as pool:
        counts = pool.map(worker, tasks)
    print(f"Wrote {sum(counts)} patches from {len(files)} images "
          f"to {args.output_dir}.")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Prepare HR training patches")
    parser.add_argument("--images_dir", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--image_size", type=int, default=400)
    parser.add_argument("--step", type=int, default=200)
    parser.add_argument("--thresh_size", type=int, default=0)
    parser.add_argument("--num_workers", type=int, default=8)
    main(parser.parse_args())
