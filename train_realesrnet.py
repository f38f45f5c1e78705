"""RealESRNet (stage-1) training driver.

TPU-native counterpart of /root/reference/train_realesrnet.py: same epoch
loop — train, validate (EMA weights + NIQE), checkpoint with best/last copies
— but the whole inner step (on-device degradation synthesis + bf16 forward/
backward + Adam + EMA) is one jitted XLA program, data-parallel over a
``jax.sharding`` device mesh.

Configured by the repo-root ``config.py`` (mode="train_realesrnet"), with CLI
overrides for smoke tests (--synthetic --steps-per-epoch --epochs).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import config as run_config
from real_esrgan_tpu.data import (
    DevicePrefetcher, ThreadedLoader, TrainImageDataset, build_eval_datasets,
)
from real_esrgan_tpu.metrics.niqe import NIQE
from real_esrgan_tpu.parallel import (
    batch_sharding, broadcast_pytree, broadcast_string, make_mesh,
    maybe_initialize_distributed, replicated_sharding,
)
from real_esrgan_tpu.data import grain_loader
from real_esrgan_tpu.train import checkpoint as ckpt_lib
from real_esrgan_tpu.train.esrnet import (
    TrainState, build_generator, build_optimizer, init_state, make_eval_fn,
    make_train_step, notfinite_count, rollback_count,
)
from real_esrgan_tpu.train.guard import guard_from_dict, guard_to_dict
from real_esrgan_tpu.utils import hostmem
from real_esrgan_tpu.utils.meters import AverageMeter, ProgressMeter


def make_train_loader(train_ds, batch: int, cfg, geo, mesh=None,
                      sharded: bool = True):
    """Build the training batch loader per ``cfg.loader``.

    "auto" first tries the device-resident pool (data/device_pool.py: whole
    crop set in HBM, on-device index gather, zero step-path host traffic)
    when the dataset fits ``cfg.device_pool_budget_bytes`` single-process;
    then the C++ decode+crop pool (GIL-free), falling back to Python
    threads.  "device" forces the pool (error if incompatible); "grain" opts
    into the deterministic resumable grain pipeline; "threads" forces the
    Python loader.  ``batch`` is the PER-HOST batch; on multi-host each
    process loads a disjoint shard (``sharded=False`` keeps per-host local
    iteration — the synthetic dataset is already per-host-sized)."""
    shard = (dict(shard_id=jax.process_index(),
                  num_shards=jax.process_count()) if sharded
             else dict(shard_id=0, num_shards=1))
    mode = getattr(cfg, "loader", "auto")
    pool_budget = getattr(cfg, "device_pool_budget_bytes", 0)
    if mode == "device" and jax.process_count() > 1:
        raise ValueError("--loader device is single-process only; multi-host "
                         "pods keep the sharded host loaders")
    if mode == "device" or (mode == "auto" and pool_budget
                            and jax.process_count() == 1):
        from real_esrgan_tpu.data import DevicePoolLoader, build_pool_array

        pool = build_pool_array(train_ds, geo.hr_size,
                                pool_budget or (1 << 62))
        if pool is not None:
            print(f"Using device-resident pool loader "
                  f"({pool.nbytes / 1e6:.0f} MB in HBM).")
            return DevicePoolLoader(pool, batch, seed=cfg.seed, mesh=mesh)
        if mode == "device":
            raise ValueError(
                "--loader device: dataset exceeds device_pool_budget_bytes "
                "or images are not uniformly hr_size-shaped")
    if mode == "grain":
        from real_esrgan_tpu.data import grain_loader

        if grain_loader.available():
            print("Using grain data loader.")
            return grain_loader.GrainLoader(
                train_ds.files, batch, geo.hr_size,
                num_workers=cfg.num_workers, seed=cfg.seed, **shard)
        print("grain unavailable; falling back to auto loader chain.")
    if mode != "threads":
        try:
            from real_esrgan_tpu.data.native_loader import (
                NativeThreadedLoader, available,
            )

            if available():
                print("Using native C++ data loader.")
                return NativeThreadedLoader(
                    train_ds.files, batch, geo.hr_size,
                    num_threads=cfg.num_workers, seed=cfg.seed,
                    cache_bytes=getattr(cfg, "decoded_cache_bytes", 0),
                    **shard)
        except Exception as exc:
            print(f"Native loader unavailable ({exc}); using Python threads.")
    return ThreadedLoader(train_ds, batch, cfg.num_workers, seed=cfg.seed,
                          **shard)


class SyntheticHRDataset:
    """Random uint8 crops — lets the full trainer run without DIV2K."""

    def __init__(self, hr_size: int, length: int = 256, seed: int = 0):
        self.hr_size = hr_size
        self.length = length
        base = np.random.default_rng(seed)
        self._images = (base.random((8, hr_size, hr_size, 3)) * 255).astype(np.uint8)

    def __len__(self):
        return self.length

    def load(self, index: int, rng: np.random.Generator) -> np.ndarray:
        return self._images[index % len(self._images)]


def validate(eval_fn, params, dataset, niqe_model, name: str, epoch: int,
             writer=None, scale: int = 4, bucket: int = 32) -> float:
    """Per-epoch NIQE over a directory of arbitrarily-sized images.

    LR inputs are edge/reflect-padded up to ``bucket`` multiples before the
    jitted forward and the SR cropped back, so shape variety (Set5/Set14)
    costs one XLA compile per bucket instead of one per image — same
    discipline as serve.SRPipeline (reference test.py jits per shape)."""
    niqe_meter = AverageMeter("NIQE", "4.2f")
    for i in range(len(dataset)):
        lr = dataset[i]["lr"]
        h, w, _ = lr.shape
        hb = -(-h // bucket) * bucket
        wb = -(-w // bucket) * bucket
        mode = "reflect" if min(h, w) > max(hb - h, wb - w) else "edge"
        padded = np.pad(lr, ((0, hb - h), (0, wb - w), (0, 0)), mode=mode)
        sr = eval_fn(params, jnp.asarray(padded[None]))
        sr = np.asarray(sr)[:, :h * scale, :w * scale]
        score = float(niqe_model(sr)[0])
        niqe_meter.update(score, 1)
    print(f"{name}: * NIQE {niqe_meter.avg:4.2f}", flush=True)
    if writer is not None:
        writer.add_scalar(f"{name}/NIQE", niqe_meter.avg, epoch + 1)
    return niqe_meter.avg


def main(args) -> None:
    if getattr(args, "cpu", False):
        jax.config.update("jax_platforms", "cpu")
    # Multi-host: span jax.devices() over the whole pod before mesh creation
    # (SURVEY §5 distributed plan; no-op on a single host).
    maybe_initialize_distributed()
    geo = run_config.geometry
    kcfg = run_config.kernel_synthesis
    dcfg = run_config.degradation
    model_cfg = run_config.model
    cfg = run_config.train_esrnet
    if args.epochs:
        # keep the LR schedule proportional to the overridden run length
        cfg = dataclasses.replace(cfg, epochs=args.epochs)
    if getattr(args, "checkpoint_frequency", 0):
        cfg = dataclasses.replace(
            cfg, checkpoint_frequency=args.checkpoint_frequency)
    if getattr(args, "loader", ""):
        cfg = dataclasses.replace(cfg, loader=args.loader)
    if getattr(args, "train_dir", ""):
        cfg = dataclasses.replace(cfg, train_image_dir=args.train_dir)
    if getattr(args, "valid_dir", ""):
        cfg = dataclasses.replace(cfg, valid_image_dir=args.valid_dir)
    if getattr(args, "test_lr_dir", ""):
        cfg = dataclasses.replace(cfg, test_lr_image_dir=args.test_lr_dir)
    if getattr(args, "test_hr_dir", ""):
        cfg = dataclasses.replace(cfg, test_hr_image_dir=args.test_hr_dir)
    if getattr(args, "lr", 0.0):
        cfg = dataclasses.replace(cfg, lr=args.lr)
    if getattr(args, "warmup_steps", -1) >= 0:
        cfg = dataclasses.replace(cfg, lr_warmup_steps=args.warmup_steps)
    if getattr(args, "train_clamp", ""):
        cfg = dataclasses.replace(cfg, train_clamp=args.train_clamp)
    exp_name = getattr(args, "exp_name", "") or run_config.exp_name

    mesh = make_mesh()
    n_dev = len(mesh.devices.ravel())
    batch = args.batch_size or cfg.batch_size
    if batch % n_dev:
        batch = (batch // n_dev) * n_dev or n_dev
        print(f"Adjusted batch size to {batch} for {n_dev} devices.")
    # each host loads its 1/process_count shard of the global batch
    local_batch = batch // jax.process_count()

    # ---- data ----
    if args.synthetic:
        # local_batch-sized length keeps steps/epoch == --steps-per-epoch
        # for ANY process count (each host iterates its own local shard)
        train_ds = SyntheticHRDataset(geo.hr_size,
                                      length=args.steps_per_epoch * local_batch)
        valid_ds, test_ds = [], []
        loader = make_train_loader(train_ds, local_batch, cfg, geo, mesh=mesh,
                                   sharded=False)
    else:
        train_ds = TrainImageDataset(cfg.train_image_dir, geo.hr_size,
                                     cache_bytes=cfg.decoded_cache_bytes)
        valid_ds, test_ds = build_eval_datasets(
            cfg.valid_image_dir, cfg.test_lr_image_dir, cfg.test_hr_image_dir,
            geo.crop_size, geo.scale)
        loader = make_train_loader(train_ds, local_batch, cfg, geo, mesh=mesh)
    steps_per_epoch = len(loader)
    print(f"Loaded datasets: {len(train_ds)} train images, "
          f"{steps_per_epoch} steps/epoch, {n_dev} devices.")

    # ---- model / optimizer / state ----
    model = build_generator(model_cfg, cfg)
    tx = build_optimizer(cfg, steps_per_epoch)
    state = init_state(jax.random.PRNGKey(cfg.seed), model, tx, geo)
    state = jax.device_put(state, replicated_sharding(mesh))
    print("Build all model successfully.")

    samples_dir = os.path.join("samples", exp_name)
    start_epoch, best_niqe = 0, 100.0
    lead = jax.process_index() == 0
    resume = args.resume or cfg.resume
    if resume == "auto":  # elastic restart: newest epoch checkpoint, if any
        # Checkpoints are written by process 0 only — resolve there and
        # broadcast so every host agrees (a per-process resolution diverges
        # on pods without a shared filesystem).
        resume = ckpt_lib.find_latest_checkpoint(samples_dir) if lead else ""
        resume = broadcast_string(resume)
        if not resume and lead:
            print("--resume auto: no checkpoint found, starting fresh.")
    if resume:
        # Lead host loads from local disk; the state is broadcast so the pod
        # gets bit-identical params even without a shared filesystem.
        host_state = jax.device_get(state)
        meta = np.zeros(2)
        if lead:
            tree = ckpt_lib.load_checkpoint(resume)
            host_state = TrainState(
                step=np.asarray(tree["step"], np.int32),
                params=ckpt_lib.merge_matching(host_state.params, tree["params"]),
                ema_params=ckpt_lib.merge_matching(host_state.ema_params,
                                                   tree["ema_params"]),
                opt_state=ckpt_lib.restore_like(host_state.opt_state,
                                                tree["opt_state"], "opt_state",
                                                on_mismatch="template"),
                # lr_scale is control state: resume keeps the learned backoff
                # (older checkpoints without a guard entry start fresh)
                guard=guard_from_dict(tree.get("guard")),
            )
            meta = np.asarray([float(tree.get("epoch", 0)),
                               float(tree.get("best_niqe", 100.0))])
        host_state, meta = broadcast_pytree((host_state, meta))
        state = jax.device_put(host_state, replicated_sharding(mesh))
        start_epoch, best_niqe = int(meta[0]), float(meta[1])
        print(f"Resumed from `{resume}` at epoch {start_epoch}.")
        if grain_loader.restore_loader_state(loader, samples_dir, start_epoch,
                                             jax.process_index()):
            print("Restored data-loader stream position.")

    train_step = make_train_step(
        model, tx, geo, kcfg, dcfg, cfg.ema_decay,
        reject_limit=cfg.grad_reject_limit, rollback_after=cfg.rollback_after,
        guard_updates=cfg.skip_nonfinite_updates,
        reject_mult=cfg.grad_reject_mult, clamp_mode=cfg.train_clamp)
    eval_fn = make_eval_fn(model)
    niqe_model = NIQE(crop_border=model_cfg.upscale_factor)

    results_dir = os.path.join("results", exp_name)
    os.makedirs(samples_dir, exist_ok=True)
    os.makedirs(results_dir, exist_ok=True)
    writer = None
    if not args.no_tensorboard:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(os.path.join("samples", "logs", exp_name))

    epochs = cfg.epochs
    data_sharding = batch_sharding(mesh)
    key = jax.random.PRNGKey(cfg.seed + 1)
    # Storm escalation (round-4 lesson: a dead run burned its full wall-clock
    # budget printing per-window WARNINGs).  Trailing-window rejection telemetry
    # turns into a loud NOT-PROGRESSING verdict, and --abort-on-storm exits
    # with rc=3 so a driving script can stop paying for a diverged run.
    from collections import deque
    storm_hist = deque(maxlen=32)   # (steps, rejections) per closed window
    lr_scale_floor = 1.0 / 64.0
    # Lead-host async checkpoint writer: overlaps epoch save IO (~1 min on a
    # relayed TPU) with the next epoch's compute.
    saver = ckpt_lib.AsyncSaver() if (cfg.async_checkpoint and lead) else None

    for epoch in range(start_epoch, epochs):
        batch_time = AverageMeter("Time", "6.3f")
        data_time = AverageMeter("Data", "6.3f")
        losses = AverageMeter("Loss", "6.6f")
        gnorms = AverageMeter("GNorm", "6.3f")
        progress = ProgressMeter(steps_per_epoch,
                                 [batch_time, data_time, losses, gnorms],
                                 prefix=f"Epoch: [{epoch + 1}]")
        end = time.time()
        # per-batch resize-upscale coins, host-drawn like the reference's
        # Python RNG (epoch-seeded so resume stays deterministic)
        coin_rng = np.random.default_rng((cfg.seed, epoch, 17))

        prefetcher = DevicePrefetcher(loader, sharding=data_sharding)
        # Every-step loss accumulation happens ON DEVICE (async adds, no sync);
        # the host fetches one window mean per print interval, so the epoch
        # average covers every iteration (reference train_realesrnet.py:397)
        # without a per-step device round-trip.
        loss_window, gn_window, rej_window, window_n = None, None, None, 0
        for batch_index, hr_uint8 in enumerate(prefetcher):
            data_time.update(time.time() - end)
            up1 = bool(coin_rng.random() < dcfg.resize_probs1[0])
            up2 = bool(coin_rng.random() < dcfg.resize_probs2[0])
            state, metrics = train_step(state, hr_uint8, key, up1, up2)
            loss_window = (metrics["loss"] if loss_window is None
                           else loss_window + metrics["loss"])
            gn_window = (metrics["grad_norm"] if gn_window is None
                         else gn_window + metrics["grad_norm"])
            rej = metrics.get("rejected")
            if rej is not None:
                rej_window = rej if rej_window is None else rej_window + rej
            window_n += 1
            if batch_index % cfg.print_frequency == 0:
                loss = float(loss_window) / window_n  # sync point
                gnorm = float(gn_window) / window_n
                losses.update(loss, batch * window_n)
                gnorms.update(gnorm, batch * window_n)
                rejected = float(rej_window) if rej_window is not None else 0.0
                window_steps = window_n
                loss_window, gn_window, rej_window, window_n = None, None, None, 0
                if rejected or not np.isfinite(loss) or not np.isfinite(gnorm):
                    print(f"WARNING: {rejected:.0f} rejected update(s) in "
                          f"window (loss {loss}, grad norm {gnorm}); "
                          f"{notfinite_count(state.guard)} rejected / "
                          f"{rollback_count(state.guard)} EMA rollbacks total, "
                          f"lr_scale {float(state.guard.lr_scale):.4f} — the "
                          "guard is holding training on healthy weights.",
                          flush=True)
                storm_hist.append((window_steps, rejected))
                trail_steps = sum(s for s, _ in storm_hist)
                trail_rej = sum(r for _, r in storm_hist)
                lr_scale_now = float(state.guard.lr_scale)
                if trail_steps >= 200 and trail_rej and (
                        trail_rej / trail_steps > 0.10
                        or (lr_scale_now <= lr_scale_floor + 1e-9
                            and trail_rej / trail_steps > 0.02)):
                    print(f"STORM: training is NOT progressing — "
                          f"{trail_rej:.0f}/{trail_steps} recent updates "
                          f"rejected ({100 * trail_rej / trail_steps:.1f}%), "
                          f"lr_scale {lr_scale_now:.4f}. The guard is in a "
                          "rollback storm; this run will not produce a "
                          "usable model at the current settings.", flush=True)
                    if getattr(args, "abort_on_storm", False):
                        if saver is not None:
                            saver.wait()
                        print("Aborting (rc=3): --abort-on-storm set. Resume "
                              "from the last healthy checkpoint with a lower "
                              "--lr or different guard settings.", flush=True)
                        raise SystemExit(3)
                if writer is not None:
                    writer.add_scalar("Train/Loss", loss,
                                      batch_index + epoch * steps_per_epoch + 1)
                batch_time.update(time.time() - end)
                progress.display(batch_index)
            else:
                batch_time.update(time.time() - end)
            end = time.time()

        # best_niqe folds in ONLY on saving epochs, so g_best always points at
        # a checkpoint that exists and can never go stale (with
        # checkpoint_frequency > 1 the user opts into coarser tracking — an
        # off-cadence best epoch is intentionally not written; frequency=1,
        # the reference default, evaluates every epoch).
        saving = ((epoch + 1) % cfg.checkpoint_frequency == 0
                  or (epoch + 1) == epochs)
        if saving:  # every process snapshots its own shard's stream position
            grain_loader.save_loader_state(loader, samples_dir, epoch + 1,
                                           jax.process_index())

        if jax.process_index() != 0:
            continue  # eval + checkpoint IO happen on the lead host only
        if not saving and writer is None:
            continue  # the NIQE would be discarded: skip the eval entirely

        ema_host = jax.device_get(state.ema_params)
        valid_niqe = (validate(eval_fn, ema_host, valid_ds, niqe_model,
                               "Valid", epoch, writer,
                               scale=model_cfg.upscale_factor)
                      if valid_ds else None)
        test_niqe = (validate(eval_fn, ema_host, test_ds, niqe_model, "Test",
                              epoch, writer, scale=model_cfg.upscale_factor)
                     if test_ds else None)
        print("")

        if not saving:
            continue
        # best tracking: test-set NIQE (reference train_realesrnet.py:108-110),
        # falling back to valid NIQE; with NO eval set the last saving epoch
        # is the best guess — g_best must always exist (it is the GAN stage's
        # default warm start).
        signal = test_niqe if test_niqe is not None else valid_niqe
        is_best = signal < best_niqe if signal is not None else True
        if signal is not None:
            # divergence watchdog: a NIQE suddenly far above the best-so-far
            # means the generator has collapsed; keep training (the hardened
            # optimizer can recover) but say so loudly in the log.
            if best_niqe < 100.0 and signal > max(3.0 * best_niqe,
                                                  best_niqe + 30.0):
                print(f"WARNING: eval NIQE {signal:.2f} is far above the best "
                      f"{best_niqe:.2f} — the model may have diverged "
                      f"({notfinite_count(state.guard)} rejected updates, "
                      f"{rollback_count(state.guard)} EMA rollbacks so far). "
                      "Consider resuming from "
                      f"results/{exp_name}/g_best.", flush=True)
            best_niqe = min(signal, best_niqe)
        payload = {
            "epoch": epoch + 1,
            "best_niqe": best_niqe,
            "step": state.step,
            "params": state.params,
            "ema_params": ema_host,
            "opt_state": state.opt_state,
            "guard": guard_to_dict(state.guard),
        }
        epoch_path = os.path.join(samples_dir, f"g_epoch_{epoch + 1}")
        # g_last tracks every saving epoch (reference train_realesrnet.py:124-129)
        # so an interrupted run always leaves a loadable results/<exp>/g_last —
        # the GAN stage's default warm-start path (config.py).
        copies = ([os.path.join(results_dir, "g_best")] if is_best else []) \
            + [os.path.join(results_dir, "g_last")]
        if saver is not None:
            saver.save(epoch_path, payload, copies)
        else:
            ckpt_lib.save_checkpoint(epoch_path, jax.device_get(payload))
            for dst in copies:
                ckpt_lib.copy_checkpoint(epoch_path, dst)
        # Host-RAM failsafe (utils/hostmem.py): the relay leak wedged round
        # 5's first run mid-checkpoint at 128 GB RSS.  Exit restartable
        # (rc=4) while a just-saved checkpoint exists and allocation works.
        if hostmem.host_memory_fraction() >= 0.8:
            if saver is not None:
                saver.wait()
            hostmem.check_host_memory(0.8)

    if saver is not None:
        saver.wait()  # final checkpoint must be durable before exit


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="RealESRNet stage-1 training (TPU)")
    parser.add_argument("--epochs", type=int, default=0, help="override config")
    parser.add_argument("--batch-size", type=int, default=0)
    parser.add_argument("--lr", type=float, default=0.0,
                        help="override the config learning rate")
    parser.add_argument("--warmup-steps", type=int, default=-1,
                        help="linear LR warmup steps (-1 = config default)")
    parser.add_argument("--train-clamp", type=str, default="",
                        choices=("", "none", "st", "hard"),
                        help="training-loss output clamp mode "
                             "(default: config; see TrainConfig.train_clamp)")
    parser.add_argument("--abort-on-storm", action="store_true",
                        help="exit rc=3 when the guard reports a rollback "
                             "storm (trailing rejection rate >10%%) instead "
                             "of burning the remaining budget")
    parser.add_argument("--resume", type=str, default="")
    parser.add_argument("--cpu", action="store_true",
                        help="force the host CPU backend (dev parity with "
                             "inference.py/eval_pair.py)")
    parser.add_argument("--synthetic", action="store_true",
                        help="train on random data (smoke test / benchmarking)")
    parser.add_argument("--steps-per-epoch", type=int, default=8,
                        help="steps per epoch in --synthetic mode")
    parser.add_argument("--no-tensorboard", action="store_true")
    parser.add_argument("--checkpoint-frequency", type=int, default=0,
                        help="save every N epochs (0 = config default); "
                             "best/final epochs always save")
    parser.add_argument("--loader", type=str, default="",
                        choices=("", "auto", "device", "grain", "threads"),
                        help="training data loader (default: config)")
    parser.add_argument("--train-dir", type=str, default="",
                        help="override config train_image_dir")
    parser.add_argument("--valid-dir", type=str, default="",
                        help="override config valid_image_dir")
    parser.add_argument("--test-lr-dir", type=str, default="",
                        help="override config test_lr_image_dir")
    parser.add_argument("--test-hr-dir", type=str, default="",
                        help="override config test_hr_image_dir")
    parser.add_argument("--exp-name", type=str, default="",
                        help="override config exp_name (samples/results dirs)")
    main(parser.parse_args())
