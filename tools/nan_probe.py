"""Instrumented repro of the InEnv10 stage-1 NaN collapse.

The hardened run (optimizer wrapped in clip+apply_if_finite) still went
loss=NaN at ~epoch 5 and STAYED NaN — which apply_if_finite should make
impossible if the poisoning entered through the optimizer (skipped updates
freeze params at the last finite state).  This probe mirrors
train_realesrnet.py's exact setup (same config path, seeds, loader, coins,
train step) and, at the first non-finite step, dissects every link:

  * pre-step params / ema / opt_state finiteness (held from before the step)
  * the degraded batch (recomputed outside the jit with the same key)
  * loss + per-layer gradient norms at that exact (params, batch)
  * post-step params finiteness (did the guard hold?)

Artifacts land in /tmp/nan_probe/ for offline analysis.

Usage:  python tools/nan_probe.py [--epochs 8] [--train-dir data/InEnv10/train]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def tree_nonfinite(tree) -> int:
    return int(sum((~np.isfinite(np.asarray(l, np.float64))).sum()
                   for l in jax.tree_util.tree_leaves(jax.device_get(tree))))


def tree_maxabs(tree) -> float:
    return float(max(np.abs(np.asarray(l, np.float64)).max()
                     for l in jax.tree_util.tree_leaves(jax.device_get(tree))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--train-dir", default="data/InEnv10/train")
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--total-epochs", type=int, default=700,
                   help="cfg.epochs as the real run set it (LR schedule)")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=0.0,
                   help="override cfg.lr (A/B the step-size regime)")
    p.add_argument("--warmup-steps", type=int, default=-1,
                   help="override cfg.lr_warmup_steps (-1 = config)")
    p.add_argument("--train-clamp", default="",
                   choices=("", "none", "st", "hard"),
                   help="training-loss clamp mode (A/B the round-5 fix; "
                        "'' = config default)")
    p.add_argument("--out", default="/tmp/nan_probe")
    a = p.parse_args()
    os.makedirs(a.out, exist_ok=True)

    import config as run_config
    from real_esrgan_tpu.data.dataset import TrainImageDataset
    from real_esrgan_tpu.ops.degradation import degrade
    from real_esrgan_tpu.parallel.mesh import (
        batch_sharding, make_mesh, replicated_sharding,
    )
    from real_esrgan_tpu.train.esrnet import (
        build_generator, build_optimizer, init_state, make_train_step,
    )
    from train_realesrnet import make_train_loader

    geo = run_config.geometry
    kcfg = run_config.kernel_synthesis
    dcfg = run_config.degradation
    cfg = dataclasses.replace(run_config.train_esrnet,
                              epochs=a.total_epochs,
                              train_image_dir=a.train_dir)
    if a.lr:
        cfg = dataclasses.replace(cfg, lr=a.lr)
    if a.warmup_steps >= 0:
        cfg = dataclasses.replace(cfg, lr_warmup_steps=a.warmup_steps)
    if a.train_clamp:
        cfg = dataclasses.replace(cfg, train_clamp=a.train_clamp)

    mesh = make_mesh()
    train_ds = TrainImageDataset(cfg.train_image_dir, geo.hr_size,
                                 cache_bytes=cfg.decoded_cache_bytes)
    loader = make_train_loader(train_ds, a.batch_size, cfg, geo)
    steps_per_epoch = len(loader)
    print(f"{len(train_ds)} train images, {steps_per_epoch} steps/epoch",
          flush=True)

    model = build_generator(run_config.model, cfg)
    tx = build_optimizer(cfg, steps_per_epoch)
    state = init_state(jax.random.PRNGKey(cfg.seed), model, tx, geo)
    state = jax.device_put(state, replicated_sharding(mesh))
    train_step = make_train_step(model, tx, geo, kcfg, dcfg, cfg.ema_decay,
                                 reject_mult=cfg.grad_reject_mult,
                                 clamp_mode=cfg.train_clamp)
    key = jax.random.PRNGKey(cfg.seed + 1)
    data_sharding = batch_sharding(mesh)

    def dissect(prev_state, hr_uint8, up1, up2, step_label):
        print(f"--- dissecting {step_label} ---", flush=True)
        report = {"label": step_label}
        for name, tree in (("params", prev_state.params),
                           ("ema", prev_state.ema_params),
                           ("opt_state", prev_state.opt_state)):
            report[f"{name}_nonfinite"] = tree_nonfinite(tree)
            report[f"{name}_maxabs"] = tree_maxabs(tree)
        k = jax.random.split(
            jax.random.fold_in(key, prev_state.step))[0]
        lr_b, hr_b = jax.jit(degrade, static_argnums=(2, 3, 4, 5, 6, 7))(
            k, jnp.asarray(hr_uint8), geo, kcfg, dcfg, True, up1, up2)
        lr_np, hr_np = np.asarray(lr_b), np.asarray(hr_b)
        report["lr_nonfinite"] = int((~np.isfinite(lr_np)).sum())
        report["hr_nonfinite"] = int((~np.isfinite(hr_np)).sum())
        report["lr_minmax"] = [float(lr_np.min()), float(lr_np.max())]
        report["hr_minmax"] = [float(hr_np.min()), float(hr_np.max())]

        from real_esrgan_tpu.train.esrnet import train_forward_model
        probe_model = train_forward_model(model, cfg.train_clamp)

        def loss_fn(params):
            sr = probe_model.apply({"params": params}, lr_b)
            return jnp.mean(jnp.abs(sr - hr_b))

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(prev_state.params)
        report["loss"] = float(loss)
        if not np.isfinite(float(loss)):
            # localize WHERE in the forward the non-finite value first appears
            _, inter = model.apply({"params": prev_state.params}, lr_b,
                                   capture_intermediates=True)
            bad_layers = []
            for path, leaf in jax.tree_util.tree_flatten_with_path(inter)[0]:
                arr = np.asarray(leaf, np.float32)
                n_bad = int((~np.isfinite(arr)).sum())
                if n_bad:
                    bad_layers.append(["/".join(map(str, path)), n_bad,
                                       float(np.nanmax(np.abs(arr)))])
            report["forward_nonfinite_layers"] = bad_layers[:20]
        report["grads_nonfinite"] = tree_nonfinite(grads)
        report["grads_maxabs"] = tree_maxabs(grads)
        report["grads_global_norm"] = float(
            jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                         for g in jax.tree_util.tree_leaves(grads))))
        # run the FULL hardened optimizer chain eagerly on this exact
        # (grads, opt_state, params) — the poisoning, if optimizer-borne,
        # must reproduce right here
        import optax
        updates, new_opt = tx.update(grads, prev_state.opt_state,
                                     prev_state.params)
        report["updates_nonfinite"] = tree_nonfinite(updates)
        report["updates_maxabs"] = tree_maxabs(updates)
        report["new_opt_nonfinite"] = tree_nonfinite(new_opt)
        params_after = optax.apply_updates(prev_state.params, updates)
        report["params_after_nonfinite"] = tree_nonfinite(params_after)
        report["total_notfinite_after"] = int(
            getattr(new_opt, "total_notfinite", -1))
        gnorms = {"/".join(map(str, path)): float(jnp.linalg.norm(leaf))
                  for path, leaf in
                  jax.tree_util.tree_flatten_with_path(grads)[0]}
        worst = sorted(gnorms.items(), key=lambda kv: -np.nan_to_num(
            kv[1], nan=np.inf, posinf=np.inf))[:12]
        report["worst_layer_grad_norms"] = worst
        np.save(os.path.join(a.out, f"{step_label}_hr_uint8.npy"),
                np.asarray(hr_uint8))
        flat = {f"p{i}": np.asarray(l) for i, l in enumerate(
            jax.tree_util.tree_leaves(jax.device_get(prev_state.params)))}
        np.savez(os.path.join(a.out, f"{step_label}_params.npz"), **flat)
        with open(os.path.join(a.out, f"{step_label}.json"), "w") as f:
            json.dump(report, f, indent=1, default=str)
        print(json.dumps(report, indent=1, default=str), flush=True)
        return report

    bad_steps = 0
    step = 0  # host-side step counter (device state.step is donated away)
    for epoch in range(a.epochs):
        coin_rng = np.random.default_rng((cfg.seed, epoch, 17))
        for batch_index, hr_uint8 in enumerate(loader):
            up1 = bool(coin_rng.random() < dcfg.resize_probs1[0])
            up2 = bool(coin_rng.random() < dcfg.resize_probs2[0])
            hr_dev = jax.device_put(jnp.asarray(hr_uint8), data_sharding)
            prev_state = state
            # train_step donates its input state; feed it a COPY so
            # prev_state's buffers stay alive for the dissection.
            state_in = jax.tree_util.tree_map(jnp.copy, state)
            state, m = train_step(state_in, hr_dev, key, up1, up2)
            loss = float(m["loss"])
            gn = float(m["grad_norm"])
            if batch_index == 0 or not np.isfinite(loss) or not np.isfinite(gn):
                print(f"e{epoch + 1} s{step}: loss {loss:.6g} gnorm {gn:.6g}",
                      flush=True)
            if not np.isfinite(loss) or not np.isfinite(gn):
                bad_steps += 1
                dissect(prev_state, hr_uint8, up1, up2,
                        f"step{step}_e{epoch + 1}")
                post_bad = tree_nonfinite(state.params)
                post_ema_bad = tree_nonfinite(state.ema_params)
                post_opt_bad = tree_nonfinite(state.opt_state)
                print(f"post-step nonfinite: params {post_bad}, "
                      f"ema {post_ema_bad}, opt {post_opt_bad}", flush=True)
                if bad_steps >= 3:
                    print("3 bad steps dissected; stopping.", flush=True)
                    return
            step += 1
    print("no non-finite step found in the probed window", flush=True)


if __name__ == "__main__":
    main()
