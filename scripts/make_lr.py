"""Generate MATLAB-bicubic LR pairs from a ground-truth image directory.

Produces the standard ``GTmod{scale}`` / ``LRbicx{scale}`` layout the
reference's valid/test sets consume (dataset.py:166-197 reads pre-made
LR dirs such as ``Set5/LRbicx4``): each GT image is mod-cropped to a
multiple of ``--scale`` and downscaled with the MATLAB-exact antialiased
bicubic (``ops/resize.matlab_resize`` — the reference's ``image_resize``,
imgproc.py:1599-1687), so PSNR against the cropped GT is alignment-exact.

    python scripts/make_lr.py --gt-dir photos/ --output-dir data/Heldout --scale 4
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--gt-dir", required=True)
    p.add_argument("--output-dir", required=True,
                   help="writes <output-dir>/GTmod<scale> and "
                        "<output-dir>/LRbicx<scale>")
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--cpu", action="store_true")
    a = p.parse_args(argv)

    if a.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from real_esrgan_tpu.ops.resize import matlab_resize
    from real_esrgan_tpu.utils.imgio import (
        load_image_rgb, natsorted_files, save_image_rgb,
    )

    gt_out = os.path.join(a.output_dir, f"GTmod{a.scale}")
    lr_out = os.path.join(a.output_dir, f"LRbicx{a.scale}")
    os.makedirs(gt_out, exist_ok=True)
    os.makedirs(lr_out, exist_ok=True)

    n = 0
    for path in natsorted_files(a.gt_dir):
        gt = load_image_rgb(path)  # float32 [0,1] HWC
        h = gt.shape[0] - gt.shape[0] % a.scale
        w = gt.shape[1] - gt.shape[1] % a.scale
        if h < a.scale or w < a.scale:
            continue
        gt = gt[:h, :w]
        lr = np.clip(np.asarray(matlab_resize(gt, 1.0 / a.scale)), 0.0, 1.0)
        name = os.path.splitext(os.path.basename(path))[0] + ".png"
        save_image_rgb(os.path.join(gt_out, name), gt)
        save_image_rgb(os.path.join(lr_out, name), lr)
        n += 1
        print(f"{name}: GT {gt.shape[0]}x{gt.shape[1]} -> "
              f"LR {lr.shape[0]}x{lr.shape[1]}")
    print(f"wrote {n} pairs to {a.output_dir}")


if __name__ == "__main__":
    main()
