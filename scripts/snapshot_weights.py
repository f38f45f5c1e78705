"""Archive a trained generator as one compact ``.npz`` weight snapshot.

Every weight-consuming surface (``inference.py``, ``scripts/eval_pair.py``,
``test.py``, the GAN trainer's ``--resume`` warm start) loads snapshots via
``checkpoint.load_generator_params``.  Purpose: trained checkpoints live in
gitignored ``results/`` and die with the machine; a ~33 MB f16 snapshot is
small enough to commit, so a quality run's outcome survives environment
resets and can seed the next run.  (Orbax dirs remain the training format —
this stores params only, no optimizer state.)

Usage:
    python scripts/snapshot_weights.py --checkpoint results/<exp>/g_best \
        --output assets/<exp>_ema.npz            # EMA weights (eval model)
    python scripts/snapshot_weights.py ... --use-params   # raw params
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args) -> str:
    import numpy as np

    from real_esrgan_tpu.train.checkpoint import (
        load_generator_params, save_params_npz,
    )

    params = load_generator_params(args.checkpoint,
                                   prefer_ema=not args.use_params)
    dtype = np.float32 if args.float32 else np.float16
    save_params_npz(args.output, params, dtype=dtype)
    size = os.path.getsize(args.output) / 1e6
    print(f"Snapshot `{args.checkpoint}` -> `{args.output}` "
          f"({dtype.__name__}, {size:.1f} MB)")
    return args.output


if __name__ == "__main__":
    p = argparse.ArgumentParser(
        description="generator weights -> compact .npz snapshot")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="Orbax checkpoint dir, .pth.tar, or .npz")
    p.add_argument("--output", type=str, required=True,
                   help="output .npz path")
    p.add_argument("--use-params", action="store_true",
                   help="snapshot raw params instead of EMA weights")
    p.add_argument("--float32", action="store_true",
                   help="keep f32 (double the size; f16 is within bf16 "
                        "round-off of the f32 originals)")
    main(p.parse_args())
