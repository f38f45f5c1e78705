"""Per-source gradient-norm probe: WHICH training tiles drive the blowups?

The InEnv10 stage-1 runs keep hitting gradient explosions (grad norms
600-36000 vs the healthy 5-50 band) no matter the update scale, which says
the pressure is data-driven, not step-size-driven.  This probe loads a
checkpoint's params (EMA by default) and, for each SOURCE (tile filename
prefix), runs the exact training loss/grad computation over that source's
tiles only — same degradation, same keys — and reports grad-norm statistics
per source over several RNG draws.  If one or two sources carry the
explosive gradients, the fix is data curation (or per-source loss scaling),
not more optimizer machinery.

Usage: python tools/grad_probe.py [--weights results/RealESRNet_inenv10/g_last]
           [--train-dir data/InEnv10/train] [--draws 8] [--batch 16]
"""

from __future__ import annotations

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="results/RealESRNet_inenv10/g_last")
    p.add_argument("--train-dir", default="data/InEnv10/train")
    p.add_argument("--draws", type=int, default=8)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--use-params", action="store_true",
                   help="probe raw params instead of the EMA")
    p.add_argument("--random-init", action="store_true",
                   help="probe a fresh random init instead of a checkpoint")
    args = p.parse_args()

    import cv2
    import optax

    from real_esrgan_tpu.configuration import RunConfig
    from real_esrgan_tpu.ops.degradation import degrade
    from real_esrgan_tpu.train import checkpoint as ckpt_lib
    from real_esrgan_tpu.train.esrnet import build_generator

    run = RunConfig()
    geo, kcfg, dcfg = run.geometry, run.kernel_synthesis, run.degradation
    cfg = run.train_esrnet
    model = build_generator(run.model, cfg)

    if args.random_init:
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, geo.lr_crop_size,
                                       geo.lr_crop_size, 3)))["params"]
    else:
        tree = ckpt_lib.load_checkpoint(args.weights)
        which = "params" if args.use_params else "ema_params"
        params = tree.get(which) or tree["params"]

    def loss_grads(params, hr_uint8, key):
        lr_b, hr_b = degrade(key, hr_uint8, geo, kcfg, dcfg)

        def loss_fn(p):
            sr = model.apply({"params": p}, lr_b)
            return jnp.abs(sr - hr_b).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss, optax.global_norm(grads)

    jitted = jax.jit(loss_grads)

    by_source = collections.defaultdict(list)
    for f in sorted(os.listdir(args.train_dir)):
        src = f.rsplit("_", 1)[0]
        by_source[src].append(os.path.join(args.train_dir, f))

    print(f"{'source':<12} {'tiles':>5} {'gnorm_med':>10} {'gnorm_max':>10} "
          f"{'loss_med':>9} {'n>500':>6}")
    for src, files in sorted(by_source.items()):
        imgs = [cv2.cvtColor(cv2.imread(f), cv2.COLOR_BGR2RGB)
                for f in files]
        gnorms, losses = [], []
        rng = np.random.default_rng(0)
        for d in range(args.draws):
            pick = rng.choice(len(imgs), size=args.batch, replace=True)
            batch = jnp.asarray(np.stack([imgs[i] for i in pick]), jnp.uint8)
            loss, gn = jitted(params, batch, jax.random.PRNGKey(1000 + d))
            gnorms.append(float(gn)); losses.append(float(loss))
        gnorms, losses = np.array(gnorms), np.array(losses)
        print(f"{src:<12} {len(files):>5} {np.median(gnorms):>10.1f} "
              f"{gnorms.max():>10.1f} {np.median(losses):>9.4f} "
              f"{(gnorms > 500).sum():>6}")


if __name__ == "__main__":
    main()
