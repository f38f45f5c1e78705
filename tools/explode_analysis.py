"""Layer-level dissection of the InEnv10 forward/backward explosion.

nan_probe.py established (artifacts in /tmp/nan_probe/): at step ~106 of the
hardened stage-1 run, with FINITE params (maxabs 0.19), CLEAN data ([0,1])
and a finite loss (~0.24), the raw gradients are finite-but-astronomical
(maxabs ~5e21).  This script loads those exact artifacts and walks the
forward pass layer by layer — in the training dtype (bf16) AND in f32 — to
find where the magnitude blows up, then recomputes the gradients in f32 to
separate genuine divergence from a precision pathology.

Usage: python tools/explode_analysis.py [--step 106] [--epoch 4] [--batch 22]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def load_params(npz_path: str, template):
    flat = np.load(npz_path)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    loaded = [flat[f"p{i}"] for i in range(len(leaves))]
    assert all(l.shape == t.shape for l, t in zip(loaded, leaves))
    return jax.tree_util.tree_unflatten(treedef, loaded)


def layer_maxabs(inter, limit=30):
    rows = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(inter)[0]:
        arr = np.asarray(leaf, np.float32)
        rows.append(("/".join(str(p) for p in path),
                     float(np.nanmax(np.abs(arr))),
                     int((~np.isfinite(arr)).sum())))
    rows.sort(key=lambda r: -r[1])
    return rows[:limit]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--step", type=int, default=106)
    p.add_argument("--epoch", type=int, default=4, help="1-indexed, as logged")
    p.add_argument("--batch", type=int, default=22, help="batch index in epoch")
    p.add_argument("--dir", default="/tmp/nan_probe")
    a = p.parse_args()

    import config as run_config
    from real_esrgan_tpu.ops.degradation import degrade
    from real_esrgan_tpu.train.esrnet import build_generator, init_state, build_optimizer

    geo = run_config.geometry
    kcfg = run_config.kernel_synthesis
    dcfg = run_config.degradation
    cfg = run_config.train_esrnet

    tag = f"step{a.step}_e{a.epoch}"
    hr_uint8 = np.load(os.path.join(a.dir, f"{tag}_hr_uint8.npy"))
    print("batch:", hr_uint8.shape, hr_uint8.dtype)

    model = build_generator(run_config.model, cfg)
    tx = build_optimizer(cfg, 28)
    template = init_state(jax.random.PRNGKey(cfg.seed), model, tx, geo).params
    params = load_params(os.path.join(a.dir, f"{tag}_params.npz"), template)

    # replay the host coin stream for (epoch, batch)
    coin_rng = np.random.default_rng((cfg.seed, a.epoch - 1, 17))
    for _ in range(a.batch):
        coin_rng.random(), coin_rng.random()
    up1 = bool(coin_rng.random() < dcfg.resize_probs1[0])
    up2 = bool(coin_rng.random() < dcfg.resize_probs2[0])
    print("coins:", up1, up2)

    key = jax.random.PRNGKey(cfg.seed + 1)
    k = jax.random.split(jax.random.fold_in(key, a.step))[0]
    lr_b, hr_b = jax.jit(degrade, static_argnums=(2, 3, 4, 5, 6, 7))(
        k, jnp.asarray(hr_uint8), geo, kcfg, dcfg, True, up1, up2)
    print("lr range", float(lr_b.min()), float(lr_b.max()))

    for dtype_name in ("bf16", "f32"):
        m = build_generator(run_config.model,
                            dataclasses.replace(cfg, use_bfloat16=dtype_name == "bf16"))
        out, inter = m.apply({"params": params}, lr_b,
                             capture_intermediates=True)
        loss = float(jnp.mean(jnp.abs(out - hr_b)))
        print(f"\n=== forward [{dtype_name}] loss {loss:.6f} — top activations ===")
        for name, mx, bad in layer_maxabs(inter, 16):
            print(f"  {mx:14.6g}  nonfinite {bad:8d}  {name}")

        def loss_fn(prm):
            sr = m.apply({"params": prm}, lr_b)
            return jnp.mean(jnp.abs(sr - hr_b))

        grads = jax.jit(jax.grad(loss_fn))(params)
        gmax = max(float(np.abs(np.asarray(g, np.float64)).max())
                   for g in jax.tree_util.tree_leaves(grads))
        print(f"grads [{dtype_name}] maxabs {gmax:.6g}")


if __name__ == "__main__":
    main()
