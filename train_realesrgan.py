"""RealESRGAN (stage-2) adversarial training driver.

TPU-native counterpart of /root/reference/train_realesrgan.py: resumes the
generator from a stage-1 checkpoint (``resume``), optionally resumes G/D GAN
checkpoints (``resume_g`` / ``resume_d``, reference :60-109), then runs the
fused jitted G+D step per batch with GAN meters and dual checkpoints
(g_* and d_*, reference :155-177).
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
from real_esrgan_tpu.data import grain_loader
from real_esrgan_tpu.metrics.niqe import NIQE
from real_esrgan_tpu.models import TrunkFeatures, trunk_feature_params
from real_esrgan_tpu.models.convert import convert_vgg19
from real_esrgan_tpu.parallel import (
    batch_sharding, broadcast_pytree, broadcast_string, make_mesh,
    maybe_initialize_distributed, replicated_sharding,
)
from real_esrgan_tpu.train import checkpoint as ckpt_lib
from real_esrgan_tpu.train.esrgan import (
    GanTrainState, build_models, build_optimizers, init_gan_state,
    make_gan_train_step,
)
from real_esrgan_tpu.train.esrnet import (
    make_eval_fn, notfinite_count, rollback_count,
)
from real_esrgan_tpu.train.guard import guard_from_dict, guard_to_dict
from real_esrgan_tpu.utils import hostmem
from real_esrgan_tpu.utils.meters import AverageMeter, ProgressMeter
from train_realesrnet import SyntheticHRDataset, validate

# --content-backbone trunk: tap conv1 (0) and the first two RRDB outputs —
# shallow keeps the 256px-resolution taps in the VGG path's FLOP class.
TRUNK_FEATURE_TAPS = (0, 1, 2)


def load_vgg_params(vgg, cfg, allow_random: bool = False) -> dict:
    """Pretrained torchvision VGG19 if a local file exists, else random.

    Random-VGG content loss is an explicit opt-in: long-horizon GAN training
    against random features drifts (docs/PARITY.md), so a quality run must
    never fall into it by scrolling past a warning line.  ``--synthetic``
    smoke runs imply the opt-in."""
    if cfg.vgg_weights_path and os.path.exists(cfg.vgg_weights_path):
        import torch

        sd = torch.load(cfg.vgg_weights_path, map_location="cpu")
        params = convert_vgg19(sd)
        print(f"Loaded VGG19 weights from `{cfg.vgg_weights_path}`.")
        return params
    if not allow_random:
        raise SystemExit(
            f"No VGG19 weights at `{cfg.vgg_weights_path}`. The perceptual "
            "content loss needs pretrained features for a quality run "
            "(random features drift over long horizons — docs/PARITY.md). "
            "Provide vgg_weights_path, or pass --allow-random-vgg to "
            "explicitly train with random VGG features.")
    print("WARNING: no VGG19 weights file — content loss uses random features "
          "(--allow-random-vgg).")
    return vgg.init(jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 3)))["params"]


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
    cfg = run_config.train_esrgan
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
    if getattr(args, "exp_name", ""):
        cfg = dataclasses.replace(cfg, exp_name=args.exp_name)
    if getattr(args, "lr", 0.0):
        cfg = dataclasses.replace(cfg, lr=args.lr)
    if getattr(args, "warmup_steps", -1) >= 0:
        cfg = dataclasses.replace(cfg, lr_warmup_steps=args.warmup_steps)
    if getattr(args, "train_clamp", ""):
        cfg = dataclasses.replace(cfg, train_clamp=args.train_clamp)

    mesh = make_mesh()
    n_dev = len(mesh.devices.ravel())
    batch = args.batch_size or cfg.batch_size
    if batch % n_dev:
        batch = (batch // n_dev) * n_dev or n_dev
    # each host loads its 1/process_count shard of the global batch
    local_batch = batch // jax.process_count()

    if args.synthetic:
        # local_batch-sized length keeps steps/epoch == --steps-per-epoch
        # for ANY process count (each host iterates its own local shard)
        train_ds = SyntheticHRDataset(geo.hr_size,
                                      length=args.steps_per_epoch * local_batch)
        valid_ds, test_ds = [], []
    else:
        train_ds = TrainImageDataset(cfg.train_image_dir, geo.hr_size,
                                     cache_bytes=cfg.decoded_cache_bytes)
        valid_ds, test_ds = build_eval_datasets(
            cfg.valid_image_dir, cfg.test_lr_image_dir, cfg.test_hr_image_dir,
            geo.crop_size, geo.scale)
    from train_realesrnet import make_train_loader
    loader = make_train_loader(train_ds, local_batch, cfg, geo, mesh=mesh,
                               sharded=not args.synthetic)
    steps_per_epoch = len(loader)
    print(f"Loaded datasets: {len(train_ds)} train images, "
          f"{steps_per_epoch} steps/epoch, {n_dev} devices.")

    generator, discriminator, vgg = build_models(model_cfg, cfg)
    g_tx, d_tx = build_optimizers(cfg, steps_per_epoch)
    state = init_gan_state(jax.random.PRNGKey(cfg.seed), generator,
                           discriminator, g_tx, d_tx, geo)
    backbone = getattr(args, "content_backbone", "") or "vgg"
    if backbone == "trunk":
        # Frozen stage-1 generator trunk as the perceptual feature space —
        # the in-env alternative when pretrained VGG19 weights don't exist
        # (random-VGG drift: docs/PARITY.md). Params are extracted AFTER the
        # warm-start load below, so the taps come from the TRAINED trunk.
        trunk_taps = tuple(t for t in TRUNK_FEATURE_TAPS
                           if t <= model_cfg.num_rrdb)
        vgg = TrunkFeatures(
            taps=trunk_taps, upscale_factor=model_cfg.upscale_factor,
            channels=model_cfg.channels, growth=model_cfg.growth_channels,
            dtype=jnp.bfloat16 if cfg.use_bfloat16 else jnp.float32)
        cfg = dataclasses.replace(
            cfg, content_weights=(1.0,) * len(trunk_taps))
        vgg_params = None
    else:
        vgg_params = load_vgg_params(
            vgg, cfg,
            allow_random=getattr(args, "allow_random_vgg", False)
            or args.synthetic)

    samples_dir = os.path.join("samples", cfg.exp_name)
    start_epoch, best_niqe = 0, 100.0
    lead = jax.process_index() == 0

    # 3-way resume (reference train_realesrgan.py:60-109).  Checkpoints are
    # written by process 0 only, so auto paths are resolved there and
    # broadcast; the loads then run on the lead host and the resulting state
    # is broadcast so the pod stays bit-identical even without a shared
    # filesystem.
    resume = args.resume or cfg.resume
    resume_g = args.resume_g or cfg.resume_g
    resume_d = args.resume_d or cfg.resume_d
    if resume_g == "auto":
        # elastic restart: newest g/d epoch checkpoints from this experiment
        resume_g = broadcast_string(
            ckpt_lib.find_latest_checkpoint(samples_dir, "g_epoch_")
            if lead else "")
        if not resume_g and lead:
            print("--resume-g auto: no checkpoint found, starting fresh.")
    if resume_d == "auto":
        resume_d = broadcast_string(
            ckpt_lib.find_latest_checkpoint(samples_dir, "d_epoch_")
            if lead else "")
    if lead:
        if resume and os.path.exists(os.path.abspath(resume)):
            g_loaded = ckpt_lib.load_generator_params(resume, prefer_ema=False)
            state = state.replace(
                g_params=ckpt_lib.merge_matching(jax.device_get(state.g_params), g_loaded),
                g_ema=ckpt_lib.merge_matching(jax.device_get(state.g_ema), g_loaded))
            print(f"Warm-started generator from `{resume}`.")
        if resume_g and os.path.exists(os.path.abspath(resume_g)):
            tree = ckpt_lib.load_checkpoint(resume_g)
            state = state.replace(
                g_params=ckpt_lib.restore_like(jax.device_get(state.g_params),
                                               tree["params"], "g_params"),
                g_ema=ckpt_lib.restore_like(jax.device_get(state.g_ema),
                                            tree["ema_params"], "g_ema"),
                g_opt=ckpt_lib.restore_like(jax.device_get(state.g_opt),
                                            tree["opt_state"], "g_opt",
                                            on_mismatch="template"),
                g_guard=guard_from_dict(tree.get("guard")),
                step=jnp.asarray(tree["step"], jnp.int32))
            start_epoch = int(tree.get("epoch", 0))
            best_niqe = float(tree.get("best_niqe", 100.0))
            print(f"Resumed generator GAN state from `{resume_g}`.")
        if resume_d and os.path.exists(os.path.abspath(resume_d)):
            tree = ckpt_lib.load_checkpoint(resume_d)
            state = state.replace(
                d_params=ckpt_lib.restore_like(jax.device_get(state.d_params),
                                               tree["params"], "d_params"),
                d_stats=ckpt_lib.restore_like(jax.device_get(state.d_stats),
                                              tree["batch_stats"], "d_stats"),
                d_opt=ckpt_lib.restore_like(jax.device_get(state.d_opt),
                                            tree["opt_state"], "d_opt",
                                            on_mismatch="template"),
                d_guard=guard_from_dict(tree.get("guard")))
            print(f"Resumed discriminator from `{resume_d}`.")
    if jax.process_count() > 1:
        meta = np.asarray([float(start_epoch), best_niqe])
        host_state, meta = broadcast_pytree((jax.device_get(state), meta))
        state = host_state
        start_epoch, best_niqe = int(meta[0]), float(meta[1])

    if grain_loader.restore_loader_state(loader, samples_dir, start_epoch,
                                         jax.process_index()):
        print("Restored data-loader stream position.")

    if backbone == "trunk":
        if not (resume or resume_g) and not args.synthetic:
            raise SystemExit(
                "--content-backbone trunk needs a stage-1 warm start "
                "(--resume <g_last>): the frozen feature space is the "
                "TRAINED trunk, not a random one.")
        vgg_params = trunk_feature_params(jax.device_get(state.g_params),
                                          trunk_taps)
        print(f"Content loss backbone: frozen stage-1 generator trunk "
              f"(taps {trunk_taps}).")

    state = jax.device_put(state, replicated_sharding(mesh))
    train_step = make_gan_train_step(generator, discriminator, vgg, vgg_params,
                                     g_tx, d_tx, geo, kcfg, dcfg, cfg)
    eval_fn = make_eval_fn(generator)
    niqe_model = NIQE(crop_border=model_cfg.upscale_factor)

    results_dir = os.path.join("results", cfg.exp_name)
    os.makedirs(samples_dir, exist_ok=True)
    os.makedirs(results_dir, exist_ok=True)
    writer = None
    if not args.no_tensorboard:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(os.path.join("samples", "logs", cfg.exp_name))

    epochs = cfg.epochs
    # Storm escalation: see train_realesrnet.py — trailing-window G rejection
    # telemetry escalates to a NOT-PROGRESSING verdict (+ rc=3 abort on flag).
    from collections import deque
    storm_hist = deque(maxlen=32)
    lr_scale_floor = 1.0 / 64.0
    data_sharding = batch_sharding(mesh)
    # Lead-host async checkpoint writer (g_* and d_* saved as one unit).
    saver = ckpt_lib.AsyncSaver() if (cfg.async_checkpoint and lead) else None
    key = jax.random.PRNGKey(cfg.seed + 1)

    for epoch in range(start_epoch, epochs):
        meters = {name: AverageMeter(name, "6.6f") for name in
                  ("Pixel", "Content", "Adversarial", "D(HR)", "D(SR)")}
        batch_time = AverageMeter("Time", "6.3f")
        progress = ProgressMeter(steps_per_epoch,
                                 [batch_time, *meters.values()],
                                 prefix=f"Epoch: [{epoch + 1}]")
        end = time.time()

        prefetcher = DevicePrefetcher(loader, sharding=data_sharding)
        # per-batch resize-upscale coins, host-drawn like the reference's
        # Python RNG (epoch-seeded so resume stays deterministic)
        coin_rng = np.random.default_rng((cfg.seed, epoch, 17))
        # Accumulate every step's metrics on device (async adds); fetch one
        # window mean per print interval so epoch averages cover every
        # iteration without per-step syncs.
        acc, window_n = None, 0
        for batch_index, hr_uint8 in enumerate(prefetcher):
            up1 = bool(coin_rng.random() < dcfg.resize_probs1[0])
            up2 = bool(coin_rng.random() < dcfg.resize_probs2[0])
            state, metrics = train_step(state, hr_uint8, key, up1, up2)
            acc = (metrics if acc is None
                   else jax.tree_util.tree_map(jnp.add, acc, metrics))
            window_n += 1
            if batch_index % cfg.print_frequency == 0:
                m = {k: float(v) / window_n for k, v in acc.items()}
                n = batch * window_n
                window_steps = window_n
                acc, window_n = None, 0
                meters["Pixel"].update(m["pixel"], n)
                meters["Content"].update(m["content"], n)
                meters["Adversarial"].update(m["adversarial"], n)
                meters["D(HR)"].update(m["d_hr_prob"], n)
                meters["D(SR)"].update(m["d_sr_prob"], n)
                # m values are window MEANS — scale back to counts so the log
                # matches the esrnet trainer's semantics
                g_rejected = m.get("g_rejected", 0.0) * window_steps
                rejected = g_rejected + m.get("d_rejected", 0.0) * window_steps
                if rejected or not all(np.isfinite(v) for v in
                                       (m["g_loss"], m["d_loss"],
                                        m["g_grad_norm"], m["d_grad_norm"])):
                    print(f"WARNING: {rejected:.0f} rejected update(s) in "
                          f"window (G loss "
                          f"{m['g_loss']}, D loss {m['d_loss']}, grad norms "
                          f"G {m['g_grad_norm']} / D {m['d_grad_norm']}); "
                          f"{notfinite_count(state.g_guard)}/"
                          f"{notfinite_count(state.d_guard)} G/D rejected, "
                          f"{rollback_count(state.g_guard)} G EMA rollbacks "
                          f"total, G lr_scale "
                          f"{float(state.g_guard.lr_scale):.4f} — the guard "
                          "is holding training on healthy weights.",
                          flush=True)
                storm_hist.append((window_steps, g_rejected))
                trail_steps = sum(s for s, _ in storm_hist)
                trail_rej = sum(r for _, r in storm_hist)
                g_scale = float(state.g_guard.lr_scale)
                if trail_steps >= 200 and trail_rej and (
                        trail_rej / trail_steps > 0.10
                        or (g_scale <= lr_scale_floor + 1e-9
                            and trail_rej / trail_steps > 0.02)):
                    print(f"STORM: training is NOT progressing — "
                          f"{trail_rej:.0f}/{trail_steps} recent G updates "
                          f"rejected ({100 * trail_rej / trail_steps:.1f}%), "
                          f"G lr_scale {g_scale:.4f}.", flush=True)
                    if getattr(args, "abort_on_storm", False):
                        if saver is not None:
                            saver.wait()
                        print("Aborting (rc=3): --abort-on-storm set.",
                              flush=True)
                        raise SystemExit(3)
                if writer is not None:
                    iters = batch_index + epoch * steps_per_epoch + 1
                    writer.add_scalar("Train/D_Loss", m["d_loss"], iters)
                    writer.add_scalar("Train/G_Loss", m["g_loss"], iters)
                    writer.add_scalar("Train/Pixel_Loss", m["pixel"], iters)
                    writer.add_scalar("Train/Content_Loss", m["content"], iters)
                    writer.add_scalar("Train/Adversarial_Loss", m["adversarial"], iters)
                    writer.add_scalar("Train/D(HR)_Probability", m["d_hr_prob"], iters)
                    writer.add_scalar("Train/D(SR)_Probability", m["d_sr_prob"], iters)
                batch_time.update(time.time() - end)
                progress.display(batch_index)
            else:
                batch_time.update(time.time() - end)
            end = time.time()

        # best_niqe folds in ONLY on saving epochs (see train_realesrnet.py:
        # g_best always points at an existing checkpoint; frequency > 1 opts
        # into coarser best tracking by design).
        saving = ((epoch + 1) % cfg.checkpoint_frequency == 0
                  or (epoch + 1) == epochs)
        if saving:  # every process snapshots its own shard's stream position
            grain_loader.save_loader_state(loader, samples_dir, epoch + 1,
                                           jax.process_index())

        if jax.process_index() != 0:
            continue  # eval + checkpoint IO happen on the lead host only
        if not saving and writer is None:
            continue  # the NIQE would be discarded: skip the eval entirely

        ema_host = jax.device_get(state.g_ema)
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
        # best tracking: test-set NIQE, falling back to valid NIQE; with NO
        # eval set every saving epoch refreshes g_best/d_best (last = best
        # guess) so downstream consumers always find them.
        signal = test_niqe if test_niqe is not None else valid_niqe
        is_best = signal < best_niqe if signal is not None else True
        if signal is not None:
            best_niqe = min(signal, best_niqe)

        g_payload = {"epoch": epoch + 1, "best_niqe": best_niqe,
                     "step": state.step,
                     "params": state.g_params,
                     "ema_params": ema_host,
                     "opt_state": state.g_opt,
                     "guard": guard_to_dict(state.g_guard)}
        d_payload = {"epoch": epoch + 1, "best_niqe": best_niqe,
                     "params": state.d_params,
                     "batch_stats": state.d_stats,
                     "opt_state": state.d_opt,
                     "guard": guard_to_dict(state.d_guard)}
        g_path = os.path.join(samples_dir, f"g_epoch_{epoch + 1}")
        d_path = os.path.join(samples_dir, f"d_epoch_{epoch + 1}")
        # last copies track every saving epoch (reference
        # train_realesrgan.py:168-177) so an interrupted run always leaves
        # loadable results/<exp>/{g_last,d_last}.
        g_copies = ([os.path.join(results_dir, "g_best")] if is_best else []) \
            + [os.path.join(results_dir, "g_last")]
        d_copies = ([os.path.join(results_dir, "d_best")] if is_best else []) \
            + [os.path.join(results_dir, "d_last")]
        if saver is not None:
            saver.save_many([(g_path, g_payload, g_copies),
                             (d_path, d_payload, d_copies)])
        else:
            for path, payload, copies in ((g_path, g_payload, g_copies),
                                          (d_path, d_payload, d_copies)):
                ckpt_lib.save_checkpoint(path, jax.device_get(payload))
                for dst in copies:
                    ckpt_lib.copy_checkpoint(path, dst)
        # Host-RAM failsafe: exit restartable while the checkpoint just
        # written is durable (see train_realesrnet.py / utils/hostmem.py).
        if hostmem.host_memory_fraction() >= 0.8:
            if saver is not None:
                saver.wait()
            hostmem.check_host_memory(0.8)

    if saver is not None:
        saver.wait()  # final checkpoints must be durable before exit


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="RealESRGAN stage-2 GAN training (TPU)")
    parser.add_argument("--epochs", type=int, default=0)
    parser.add_argument("--batch-size", type=int, default=0)
    parser.add_argument("--lr", type=float, default=0.0,
                        help="override the config learning rate")
    parser.add_argument("--warmup-steps", type=int, default=-1,
                        help="linear LR warmup steps (-1 = config default)")
    parser.add_argument("--train-clamp", type=str, default="",
                        choices=("", "none", "st", "hard"),
                        help="G training-loss output clamp mode "
                             "(default: config; see TrainConfig.train_clamp)")
    parser.add_argument("--abort-on-storm", action="store_true",
                        help="exit rc=3 when the guard reports a rollback "
                             "storm instead of burning the remaining budget")
    parser.add_argument("--resume", type=str, default="")
    parser.add_argument("--resume-g", type=str, default="")
    parser.add_argument("--resume-d", type=str, default="")
    parser.add_argument("--cpu", action="store_true",
                        help="force the host CPU backend (dev parity with "
                             "inference.py/eval_pair.py)")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--steps-per-epoch", type=int, default=8)
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
    parser.add_argument("--content-backbone", type=str, default="vgg",
                        choices=("vgg", "trunk"),
                        help="perceptual feature space: pretrained VGG19 "
                             "(reference parity) or the frozen stage-1 "
                             "generator trunk (no external weights needed)")
    parser.add_argument("--allow-random-vgg", action="store_true",
                        help="explicitly allow GAN training with random VGG "
                             "features when no pretrained weights exist")
    main(parser.parse_args())
