"""Stage-2 (RealESRGAN) adversarial training: fused jitted G+D step.

Re-design of the reference GAN trainer (/root/reference/train_realesrgan.py):
per iteration —
  G-step: pixel 1.0*L1(usm(sr), hr) + weighted 5-tap VGG content loss on
          (usm(sr), hr) + 0.1*BCE(D(sr), 1)   (:473-487)
  D-step: BCE(D(hr), 1) + BCE(D(sr.detach()), 0)  (:498-517)
  EMA update of G                                  (:521)
— all compiled into one XLA program, data-parallel over the mesh.  Labels are
pixel-wise maps (the discriminator is a U-Net emitting per-pixel logits,
:460-462).

Spectral-norm power-iteration state (flax ``batch_stats``) advances on every
discriminator forward — G-step D(sr), D-step D(hr), D-step D(sr.detach()) —
exactly matching torch's spectral_norm, which power-iterates on every
train-mode forward (reference train_realesrgan.py:479,499,505; pinned by
tests/test_spectral_norm_parity.py).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from real_esrgan_tpu.configuration import (
    DegradationConfig, GanTrainConfig, KernelSynthesisConfig, ModelConfig,
    PipelineGeometry,
)
from real_esrgan_tpu.models import (
    Generator, UNetDiscriminator, ema_update,
)
from real_esrgan_tpu.models.vgg import VGG19Features, normalize_imagenet
from real_esrgan_tpu.models.ema import ema_init
from real_esrgan_tpu.ops.degradation import degrade
from real_esrgan_tpu.ops.usm import gaussian_kernel_1d, usm_sharpen
from real_esrgan_tpu.train.esrnet import harden_optimizer, train_forward_model
from real_esrgan_tpu.train.guard import GuardState, guard_init, guarded_update
from real_esrgan_tpu.train.schedule import multistep_lr


@flax.struct.dataclass
class GanTrainState:
    step: jnp.ndarray
    g_params: Any
    g_ema: Any
    g_opt: Any
    d_params: Any
    d_stats: Any
    d_opt: Any
    g_guard: GuardState
    d_guard: GuardState


def build_models(model_cfg: ModelConfig, cfg: GanTrainConfig):
    dtype = jnp.bfloat16 if cfg.use_bfloat16 else jnp.float32
    generator = Generator(
        in_channels=model_cfg.in_channels, out_channels=model_cfg.out_channels,
        upscale_factor=model_cfg.upscale_factor, num_rrdb=model_cfg.num_rrdb,
        channels=model_cfg.channels, growth=model_cfg.growth_channels,
        dtype=dtype, remat=cfg.remat_rrdb)
    discriminator = UNetDiscriminator(dtype=dtype)
    vgg = VGG19Features(nodes=tuple(cfg.vgg_nodes), dtype=dtype)
    return generator, discriminator, vgg


def build_optimizers(cfg: GanTrainConfig, steps_per_epoch: int):
    schedule = multistep_lr(cfg.lr, cfg.effective_lr_milestones, cfg.lr_gamma,
                            steps_per_epoch,
                            warmup_steps=getattr(cfg, "lr_warmup_steps", 0))
    g_tx = harden_optimizer(
        optax.adam(schedule, b1=cfg.betas[0], b2=cfg.betas[1]), cfg)
    d_tx = harden_optimizer(
        optax.adam(schedule, b1=cfg.betas[0], b2=cfg.betas[1]), cfg)
    return g_tx, d_tx


def init_gan_state(key: jax.Array, generator, discriminator, g_tx, d_tx,
                   geo: PipelineGeometry) -> GanTrainState:
    kg, kd = jax.random.split(key)
    lr_crop, crop = geo.lr_crop_size, geo.crop_size
    g_params = generator.init(kg, jnp.zeros((1, lr_crop, lr_crop, 3)))["params"]
    d_vars = discriminator.init(kd, jnp.zeros((1, crop, crop, 3)))
    return GanTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params, g_ema=ema_init(g_params), g_opt=g_tx.init(g_params),
        d_params=d_vars["params"], d_stats=d_vars["batch_stats"],
        d_opt=d_tx.init(d_vars["params"]),
        g_guard=guard_init(), d_guard=guard_init())


def make_gan_train_step(generator, discriminator, vgg, vgg_params,
                        g_tx, d_tx, geo: PipelineGeometry,
                        kcfg: KernelSynthesisConfig, dcfg: DegradationConfig,
                        cfg: GanTrainConfig) -> Callable:
    """Returns jitted (state, hr_uint8, key) -> (state, metrics)."""
    content_weights = jnp.asarray(cfg.content_weights, jnp.float32)
    usm_kernel = gaussian_kernel_1d(dcfg.usm_radius, 0.0)  # host numpy, static
    bce = optax.sigmoid_binary_cross_entropy
    # G's training forward runs unclamped by default (train_clamp="none"):
    # the in-forward clamp removes the pixel loss's restoring force against
    # trunk-gain explosion (see Generator.clamp).  The raw output also feeds
    # the content loss and D, as basicsr-upstream does during training.
    train_generator = train_forward_model(
        generator, getattr(cfg, "train_clamp", "none"))
    reject_mult = getattr(cfg, "grad_reject_mult", 8.0)

    # VGG19Features expects ImageNet-normalized inputs; TrunkFeatures (the
    # frozen stage-1 trunk backbone) consumes raw [0, 1] generator inputs.
    norm = (normalize_imagenet if getattr(vgg, "imagenet_input", True)
            else (lambda x: x))

    def content_loss(sr_sharp, hr):
        sr_f = vgg.apply({"params": vgg_params}, norm(sr_sharp))
        hr_f = vgg.apply({"params": vgg_params}, norm(hr))
        taps = jnp.stack([jnp.mean(jnp.abs(a - b)) for a, b in zip(sr_f, hr_f)])
        return jnp.sum(content_weights * taps)

    def g_loss_fn(g_params, d_params, d_stats, lr_b, hr_b):
        sr = train_generator.apply({"params": g_params}, lr_b)
        sr_sharp = usm_sharpen(sr, usm_kernel, dcfg.usm_weight, dcfg.usm_threshold)
        pixel = cfg.pixel_weight * jnp.mean(jnp.abs(sr_sharp - hr_b))
        content = content_loss(sr_sharp, hr_b)
        # update_stats=True: torch's spectral_norm power-iterates on EVERY
        # train-mode forward, including this G-step D(sr) (reference
        # train_realesrgan.py:479) — so u advances 3x per iteration (here,
        # then D(hr), then D(sr.detach())).  Matching the cadence exactly
        # keeps converted-weights sigma trajectories in lockstep with torch
        # (tests/test_spectral_norm_parity.py).
        logits, d_vs = discriminator.apply(
            {"params": d_params, "batch_stats": d_stats}, sr,
            update_stats=True, mutable=["batch_stats"])
        adversarial = cfg.adversarial_weight * jnp.mean(
            bce(logits, jnp.ones_like(logits)))
        total = pixel + content + adversarial
        return total, {"sr": sr, "pixel": pixel, "content": content,
                       "adversarial": adversarial, "g_loss": total,
                       "d_stats": d_vs["batch_stats"]}

    def d_loss_fn(d_params, d_stats, sr_detached, hr_b):
        hr_logits, vs = discriminator.apply(
            {"params": d_params, "batch_stats": d_stats}, hr_b,
            update_stats=True, mutable=["batch_stats"])
        sr_logits, vs2 = discriminator.apply(
            {"params": d_params, "batch_stats": vs["batch_stats"]}, sr_detached,
            update_stats=True, mutable=["batch_stats"])
        d_loss_hr = jnp.mean(bce(hr_logits, jnp.ones_like(hr_logits)))
        d_loss_sr = jnp.mean(bce(sr_logits, jnp.zeros_like(sr_logits)))
        loss = d_loss_hr + d_loss_sr
        aux = {"d_stats": vs2["batch_stats"], "d_loss": loss,
               "d_hr_prob": jnp.mean(jax.nn.sigmoid(hr_logits)),
               "d_sr_prob": jnp.mean(jax.nn.sigmoid(sr_logits))}
        return loss, aux

    def train_step(state: GanTrainState, hr_uint8: jnp.ndarray,
                   key: jax.Array, up1: bool, up2: bool
                   ) -> Tuple[GanTrainState, Dict[str, jnp.ndarray]]:
        k_degrade, _ = jax.random.split(jax.random.fold_in(key, state.step))
        lr_b, hr_b = degrade(k_degrade, hr_uint8, geo, kcfg, dcfg,
                             up1=up1, up2=up2)

        # ---- generator step (D frozen: grads only wrt g_params) ----
        (_, g_aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params, state.d_params, state.d_stats, lr_b, hr_b)
        if cfg.skip_nonfinite_updates:
            g_params, g_ema, g_opt, g_guard, g_info = guarded_update(
                g_tx, g_grads, state.g_opt, state.g_params, state.g_ema,
                state.g_guard, reject_limit=cfg.grad_reject_limit,
                rollback_after=cfg.rollback_after, ema_decay=cfg.ema_decay,
                reject_mult=reject_mult)
        else:
            g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
            g_params = optax.apply_updates(state.g_params, g_updates)
            g_ema = ema_update(state.g_ema, g_params, cfg.ema_decay)
            g_guard = state.g_guard
            g_info = {"grad_norm": optax.global_norm(g_grads)}

        # ---- discriminator step on sr.detach() ----
        # chain the G-step's power-iteration advance into the D step
        d_stats_after_g = jax.lax.stop_gradient(g_aux.pop("d_stats"))
        sr_detached = jax.lax.stop_gradient(g_aux.pop("sr"))
        (_, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params, d_stats_after_g, sr_detached, hr_b)
        if cfg.skip_nonfinite_updates:
            # reject-only (rollback_after=0): D has no EMA to roll back to.
            # Its lr_scale still backs off on an 8-rejection streak, and the
            # adaptive reject_mult ceiling tracks D's OWN gradient band (the
            # fixed limit was calibrated on G's), so D cannot silently freeze.
            d_params, _, d_opt, d_guard, d_info = guarded_update(
                d_tx, d_grads, state.d_opt, state.d_params, state.d_params,
                state.d_guard, reject_limit=cfg.grad_reject_limit,
                rollback_after=0, ema_decay=cfg.ema_decay,
                reject_mult=reject_mult)
        else:
            d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
            d_params = optax.apply_updates(state.d_params, d_updates)
            d_guard = state.d_guard
            d_info = {"grad_norm": optax.global_norm(d_grads)}
        d_stats = d_aux.pop("d_stats")

        new_state = GanTrainState(step=state.step + 1, g_params=g_params,
                                  g_ema=g_ema, g_opt=g_opt, d_params=d_params,
                                  d_stats=d_stats, d_opt=d_opt,
                                  g_guard=g_guard, d_guard=d_guard)
        # pre-clip global norms: the explosion telltales (see train/guard.py)
        metrics = {**g_aux, **d_aux}
        metrics.update({f"g_{k}": v for k, v in g_info.items()})
        metrics.update({f"d_{k}": v for k, v in d_info.items()})
        return new_state, metrics

    jitted = jax.jit(train_step, static_argnums=(3, 4), donate_argnums=(0,))

    def step(state, hr_uint8, key, up1: bool = False, up2: bool = False):
        """up1/up2: host-drawn per-batch resize-upscale flags (see
        ops/degradation.degrade); one compiled program per combination."""
        return jitted(state, hr_uint8, key, bool(up1), bool(up2))

    return step
