"""Stage-1 (RealESRNet) training: one fused, data-parallel jitted step.

Re-design of the reference trainer (/root/reference/train_realesrnet.py):
the per-batch Python degradation prelude + autocast forward/backward +
optimizer + EMA (train_realesrnet.py:258-394) become ONE compiled XLA
program per step — degradation synthesis, bf16 RRDB forward, L1 loss,
backward, Adam update and EMA all fuse and overlap on the TPU, with the
batch sharded across the device mesh (gradients all-reduced over ICI by XLA).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from real_esrgan_tpu.configuration import (
    DegradationConfig, KernelSynthesisConfig, ModelConfig, PipelineGeometry,
    TrainConfig,
)
from real_esrgan_tpu.models import Generator, ema_init, ema_update
from real_esrgan_tpu.ops.degradation import degrade
from real_esrgan_tpu.train.guard import GuardState, guard_init, guarded_update
from real_esrgan_tpu.train.schedule import step_lr


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    ema_params: Any
    opt_state: Any
    guard: GuardState


def build_generator(model_cfg: ModelConfig, train_cfg: TrainConfig) -> Generator:
    return Generator(
        in_channels=model_cfg.in_channels,
        out_channels=model_cfg.out_channels,
        upscale_factor=model_cfg.upscale_factor,
        num_rrdb=model_cfg.num_rrdb,
        channels=model_cfg.channels,
        growth=model_cfg.growth_channels,
        dtype=jnp.bfloat16 if train_cfg.use_bfloat16 else jnp.float32,
        remat=train_cfg.remat_rrdb,
    )


def build_optimizer(train_cfg: TrainConfig, steps_per_epoch: int):
    """Adam(lr, betas=(0.9, 0.99)) + StepLR, as the reference
    (train_realesrnet.py:197-206) — hardened with global-norm clipping and
    skip-on-nonfinite (see TrainConfig.grad_clip_norm for the failure this
    prevents)."""
    schedule = step_lr(train_cfg.lr, train_cfg.effective_lr_step_size, train_cfg.lr_gamma,
                       steps_per_epoch,
                       warmup_steps=getattr(train_cfg, "lr_warmup_steps", 0))
    adam = optax.adam(schedule, b1=train_cfg.betas[0], b2=train_cfg.betas[1])
    return harden_optimizer(adam, train_cfg)


def train_forward_model(model: Generator, clamp_mode: str) -> Generator:
    """The generator variant the TRAINING LOSS runs on.

    clamp_mode (TrainConfig.train_clamp): "none" returns the raw pre-clamp
    output (basicsr-upstream; the restoring-force fix — see Generator.clamp),
    "st" the straight-through clamp, "hard" the reference's exact clamp.
    Eval paths keep using ``model`` itself (clamped output).
    """
    if clamp_mode not in ("none", "st", "hard"):
        raise ValueError(f"train_clamp must be none|st|hard, got {clamp_mode!r}")
    return model.clone(clamp=clamp_mode != "none", st_clamp=clamp_mode == "st")


def harden_optimizer(tx, train_cfg: TrainConfig):
    """Clip gradients to a global norm inside the optimizer chain.

    Non-finite and outlier gradients are handled OUTSIDE the chain, by the
    step-level guard (train/guard.py: rejection + EMA rollback) — an
    optimizer wrapper alone cannot recover from divergence, only freeze at
    the diverged weights (see guard.py's post-mortem).  Clipping stays in
    the chain to bound what finite, under-limit gradients feed Adam.
    """
    if train_cfg.grad_clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(train_cfg.grad_clip_norm), tx)
    return tx


def notfinite_count(guard: GuardState) -> int:
    """Total gradient steps rejected (non-finite or over the reject limit)."""
    return int(guard.rejected_total)


def rollback_count(guard: GuardState) -> int:
    """Total EMA rollbacks performed by the guard."""
    return int(guard.rollback_total)


def init_state(key: jax.Array, model: Generator, tx,
               geo: PipelineGeometry) -> TrainState:
    lr_crop = geo.lr_crop_size
    params = model.init(key, jnp.zeros((1, lr_crop, lr_crop, 3)))["params"]
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      ema_params=ema_init(params), opt_state=tx.init(params),
                      guard=guard_init())


def make_train_step(model: Generator, tx, geo: PipelineGeometry,
                    kcfg: KernelSynthesisConfig, dcfg: DegradationConfig,
                    ema_decay: float, *, reject_limit: float = 500.0,
                    rollback_after: int = 4,
                    guard_updates: bool = True,
                    reject_mult: float = 8.0,
                    clamp_mode: str = "none") -> Callable:
    """Returns jitted (state, hr_uint8, key) -> (state, metrics).

    guard_updates enables the rejection + EMA-rollback guard (train/guard.py)
    around the optimizer; reject_limit / rollback_after / reject_mult tune it.
    clamp_mode selects the training-loss output clamp (see
    train_forward_model); eval always clamps.
    """
    train_model = train_forward_model(model, clamp_mode)

    def loss_fn(params, lr_batch, hr_batch):
        sr = train_model.apply({"params": params}, lr_batch)
        return jnp.mean(jnp.abs(sr - hr_batch))

    def train_step(state: TrainState, hr_uint8: jnp.ndarray, key: jax.Array,
                   up1: bool, up2: bool
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        k_degrade, _ = jax.random.split(jax.random.fold_in(key, state.step))
        lr_batch, hr_batch = degrade(k_degrade, hr_uint8, geo, kcfg, dcfg,
                                     up1=up1, up2=up2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params, lr_batch, hr_batch)
        if guard_updates:
            params, ema_params, opt_state, guard, info = guarded_update(
                tx, grads, state.opt_state, state.params, state.ema_params,
                state.guard, reject_limit=reject_limit,
                rollback_after=rollback_after, ema_decay=ema_decay,
                reject_mult=reject_mult)
        else:
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema_params = ema_update(state.ema_params, params, ema_decay)
            guard = state.guard
            info = {"grad_norm": optax.global_norm(grads)}

        new_state = TrainState(step=state.step + 1, params=params,
                               ema_params=ema_params, opt_state=opt_state,
                               guard=guard)
        # grad_norm is the pre-clip global norm: the explosion telltale
        # (inf/huge here + a loss plateau = steps being rejected).
        return new_state, {"loss": loss, **info}

    jitted = jax.jit(train_step, static_argnums=(3, 4), donate_argnums=(0,))

    def step(state, hr_uint8, key, up1: bool = False, up2: bool = False):
        """up1/up2: host-drawn per-batch resize-upscale flags (see
        ops/degradation.degrade); one compiled program per combination."""
        return jitted(state, hr_uint8, key, bool(up1), bool(up2))

    step.jitted = jitted  # for compile-only gates (.lower without execute)
    return step


def make_eval_fn(model: Generator) -> Callable:
    """Jitted SR forward used by validation (EMA weights)."""

    @jax.jit
    def eval_fn(params, lr_batch):
        return model.apply({"params": params}, lr_batch)

    return eval_fn
