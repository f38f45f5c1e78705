"""Directory evaluation: super-resolve every image in a folder, save outputs,
report mean NIQE.

TPU-native counterpart of /root/reference/test.py: loads the EMA generator
weights (with ``model.`` prefix strip for .pth.tar), natural-sorts the LR
directory, SRs each image with a jitted forward (bucketed by shape to bound
recompiles), writes results, and prints the average NIQE clamped to 100
(test.py:93-95).  Configured by the repo-root ``config.py`` test mode, with
optional CLI overrides.
"""

import argparse
import os

import numpy as np

from real_esrgan_tpu.metrics.niqe import DEFAULT_MODEL_PATH, NIQE
from real_esrgan_tpu.serve import SRPipeline
from real_esrgan_tpu.utils.imgio import (
    array_to_image, load_image_rgb, natsorted_files, save_image_rgb,
)
from real_esrgan_tpu.utils.meters import AverageMeter


def main(args) -> float:
    from real_esrgan_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed()  # no-op on a single host
    pipeline = SRPipeline(
        weights_path=args.model_path if (args.model_path and
                                         os.path.exists(args.model_path)) else "",
        upscale_factor=args.upscale_factor, bfloat16=args.bfloat16)
    if not (args.model_path and os.path.exists(args.model_path)):
        print("WARNING: no weights file found — using random initialization.")
    else:
        print(f"Loaded `{args.model_path}` weights.")

    niqe_model = NIQE(crop_border=args.upscale_factor,
                      model_path=args.niqe_model_path)

    os.makedirs(args.sr_dir, exist_ok=True)
    niqe_meter = AverageMeter("NIQE", "4.2f")
    # --hr_dir is live (not a carried-over quirk): when the directory holds a
    # same-named ground truth, mean PSNR is reported alongside NIQE.  The
    # reference accepts the flag but never reads it (reference test.py is
    # NIQE-only); this repo has a pair eval (scripts/eval_pair.py), so the
    # flag silently doing nothing would be a trap.
    psnr_meter = AverageMeter("PSNR", "5.2f")

    files = natsorted_files(args.lr_dir)
    if not files:
        raise FileNotFoundError(f"No image files found in {args.lr_dir}")
    for index, path in enumerate(files):
        lr_image = load_image_rgb(path)
        # bucketed shapes bound recompiles across differently-sized images
        sr_np = pipeline.upscale(lr_image)[None]

        out_path = os.path.join(args.sr_dir, os.path.basename(path))
        save_image_rgb(out_path, array_to_image(sr_np))

        score = float(niqe_model(sr_np)[0])
        niqe_meter.update(score, 1)
        line = (f"[{index + 1}/{len(files)}] {os.path.basename(path)}  "
                f"NIQE {score:4.2f}")

        hr_path = os.path.join(args.hr_dir or "", os.path.basename(path))
        if args.hr_dir and os.path.exists(hr_path):
            hr = load_image_rgb(hr_path)
            if hr.shape == sr_np[0].shape:
                mse = float(np.mean(
                    (sr_np[0].astype(np.float64) - hr) ** 2))
                psnr = 10 * np.log10(1.0 / mse) if mse > 0 else 99.0
                psnr_meter.update(psnr, 1)
                line += f"  PSNR {psnr:5.2f} dB"
            else:
                line += f"  PSNR n/a (GT shape {hr.shape} != {sr_np[0].shape})"
        print(line)

    avg = min(niqe_meter.avg, 100.0)
    # NIQE-only default final line (reference test.py:93-95 parity); the PSNR
    # summary is additive and only appears when ground truths were found.
    print(f"NIQE: {avg:4.2f} 100u")
    if psnr_meter.count:
        print(f"PSNR: {psnr_meter.avg:5.2f} dB ({psnr_meter.count} pairs)")
    return avg


if __name__ == "__main__":
    import config as run_config

    parser = argparse.ArgumentParser(description="Batch SR evaluation with NIQE")
    parser.add_argument("--lr_dir", type=str,
                        default=getattr(run_config, "lr_dir",
                                        "./data/Set5/LRbicx4"))
    parser.add_argument("--sr_dir", type=str,
                        default=getattr(run_config, "sr_dir",
                                        f"./results/test/{run_config.exp_name}"))
    parser.add_argument("--hr_dir", type=str,
                        default=getattr(run_config, "hr_dir",
                                        "./data/Set5/GTmod12"))
    parser.add_argument("--model_path", type=str,
                        default=getattr(run_config, "model_path", ""))
    parser.add_argument("--niqe_model_path", type=str, default=DEFAULT_MODEL_PATH)
    parser.add_argument("--upscale_factor", type=int,
                        default=run_config.upscale_factor)
    parser.add_argument("--bfloat16", action="store_true")
    main(parser.parse_args())
