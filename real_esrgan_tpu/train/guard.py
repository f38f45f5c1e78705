"""In-graph gradient rejection + EMA rollback: training self-healing.

Why this exists (the InEnv10 stage-1 post-mortem, round 4): RRDB trunks are
residual chains whose effective gain sits near criticality.  On some inputs
the trained weights go super-critical — the forward pass amplifies
exponentially along the trunk (measured: trunk_19 ~1e19 -> trunk_22 ~6e21 ->
1e22 at the output convs, with params maxabs 0.19 and clean [0,1] inputs,
in f32 as well as bf16) — and the output clamp hides it from the LOSS while
the straight-through clamp gradient carries it into the GRADS (finite-huge,
~5e21).  Two prior guard designs both turned this one-step event into a dead
run:

* raw Adam (reference parity, /root/reference/train_realesrnet.py:258-394):
  nu ingests g^2 = inf and never decays it — every later update is exactly
  zero; the run trains a frozen model for hundreds of epochs.
* optax.apply_if_finite + clip (round-4 first fix): params freeze at the
  last finite state — which is already super-critical, so EVERY later batch
  explodes, every update is rejected, and training never moves again.

The resolution is that skipping is not enough: the trainer must be able to
UNDO the steps that walked it off the cliff.  The EMA (decay 0.999, i.e. a
~1000-step average) is exactly such an undo buffer — it lags the divergence
ramp (~20 steps) by 50x, so when rejections pile up, rolling params back to
the EMA restores a pre-ramp, healthy model, and zeroing Adam's moments
forgets the ramp's direction.  Everything is in-graph (jnp.where selects, no
lax.cond, donation-safe) so the jitted step stays a single fused program.

Guard policy per step:
  1. reject the update if the global grad norm is non-finite OR above
     ``reject_limit`` OR above ``reject_mult`` x a running average of
     accepted norms (the healthy band is 5-50 early and moves as loss
     falls; the round-4 storm showed the fixed limit alone ACCEPTS
     divergence-ramp steps at 2-10x healthy) — optimizer state, params
     and EMA all stay put;
  2. after ``rollback_after`` consecutive rejections: params <- EMA, float
     optimizer moments <- 0 (integer schedule counts are preserved);
  3. every rollback HALVES an update scale (``lr_scale``, floor 1/64) that
     multiplies accepted updates, and ``recover_after`` consecutive
     accepted steps double it back (cap 1.0).

Step 3 exists because rollback alone cannot escape a PERSISTENT attractor:
the first guarded production run rode out isolated events fine, but a later
one entered a rollback storm (rejection rate climbing 11% -> 39% over 270
epochs, loss pinned at ~0.25) — at the configured LR, every path from the
EMA led back over the cliff, so reject -> rollback -> re-walk looped
forever.  Halving the effective step size on each rollback turns the guard
into a complete control loop: slow down until the trajectory is stable,
then re-accelerate once it demonstrably is.  Scaling the UPDATE is exactly
scaling Adam's lr (updates are lr-proportional), without touching the
optimizer's schedule state.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from real_esrgan_tpu.models.ema import ema_update


@flax.struct.dataclass
class GuardState:
    """Streak counters, telemetry, and the adaptive update scale."""
    reject_streak: jnp.ndarray      # int32, consecutive rejections
    rejected_total: jnp.ndarray     # int32
    rollback_total: jnp.ndarray     # int32
    accept_streak: jnp.ndarray      # int32, consecutive accepted steps
    lr_scale: jnp.ndarray           # f32 in [floor, 1], multiplies updates
    # exponential moving average of ACCEPTED grad norms (0 = no history yet);
    # the adaptive reject threshold is reject_mult * this — the healthy band
    # moves as the loss falls (measured 5-50 early, lower later), so a fixed
    # limit either admits 10x-healthy steps or rejects healthy ones
    gnorm_ref: jnp.ndarray          # f32


def guard_init() -> GuardState:
    # DISTINCT arrays per field: the train step donates its input state, and
    # a shared zeros() would be donated twice (see models/ema.py)
    return GuardState(reject_streak=jnp.zeros((), jnp.int32),
                      rejected_total=jnp.zeros((), jnp.int32),
                      rollback_total=jnp.zeros((), jnp.int32),
                      accept_streak=jnp.zeros((), jnp.int32),
                      lr_scale=jnp.ones((), jnp.float32),
                      gnorm_ref=jnp.zeros((), jnp.float32))


def guard_to_dict(guard: GuardState) -> Dict[str, Any]:
    """Name-keyed snapshot for checkpoints.

    lr_scale is CONTROL state (it multiplies every accepted update), not
    telemetry — an elastic restart that reset it mid-backoff would resume at
    full step size and re-pay the reject/rollback ramp.  Field names key the
    dict because GuardState's field order is not alphabetical, so a
    structural (leaf-order) restore would scramble it (see
    checkpoint.restore_like's ordering caveat)."""
    return {f: getattr(guard, f) for f in (
        "reject_streak", "rejected_total", "rollback_total", "accept_streak",
        "lr_scale", "gnorm_ref")}


def guard_from_dict(d: Any) -> GuardState:
    """Rebuild GuardState from a checkpoint dict; missing fields (older
    checkpoints) keep their fresh-init values."""
    init = guard_init()
    if not isinstance(d, dict):
        return init
    return GuardState(**{
        f: jnp.asarray(d[f], getattr(init, f).dtype) if f in d
        else getattr(init, f)
        for f in ("reject_streak", "rejected_total", "rollback_total",
                  "accept_streak", "lr_scale", "gnorm_ref")})


def tree_select(pred: jnp.ndarray, on_true: Any, on_false: Any) -> Any:
    """Elementwise pytree select on a scalar predicate (fuses; no cond)."""
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(pred, a, b), on_true, on_false)


def _zero_float_leaves(pred: jnp.ndarray, tree: Any) -> Any:
    """Where pred, zero float leaves (Adam mu/nu); keep integer leaves
    (schedule counts) so the LR schedule does not rewind."""
    return jax.tree_util.tree_map(
        lambda l: (jnp.where(pred, jnp.zeros_like(l), l)
                   if jnp.issubdtype(l.dtype, jnp.floating) else l), tree)


def guarded_update(tx, grads: Any, opt_state: Any, params: Any, ema: Any,
                   guard: GuardState, *, reject_limit: float,
                   rollback_after: int, ema_decay: float,
                   backoff: float = 0.5, lr_scale_floor: float = 1.0 / 64.0,
                   recover_after: int = 256, reject_mult: float = 8.0,
                   gnorm_ref_decay: float = 0.98
                   ) -> Tuple[Any, Any, Any, GuardState, Dict[str, jnp.ndarray]]:
    """One guarded optimizer step.

    Args:
        tx: the inner transformation (clip + adam); applied only on accepted
            steps.  Note: tx's integer schedule count advances only on
            ACCEPTED steps while TrainState.step advances every batch, so
            StepLR/milestone boundaries drift late by the cumulative
            rejection count — negligible at healthy (<1%) rejection rates,
            and conservative (slower decay) during storms.
        ema: the params' EMA tree — the rollback target.  Updated (with
            ``ema_decay``) only on accepted steps, so a long rejection streak
            cannot poison it.  Pass ``rollback_after=0`` to disable rollback
            (e.g. for a discriminator with no EMA — pass ``ema=params`` then);
            a rollback-free guard still backs off ``lr_scale`` on an
            8-rejection streak so it cannot silently freeze forever.
        reject_limit: absolute global-grad-norm ceiling; 0 disables the
            magnitude check (non-finite norms are always rejected).
        reject_mult: adaptive ceiling — once a running average of ACCEPTED
            grad norms exists (``guard.gnorm_ref``), any step above
            ``reject_mult * gnorm_ref`` is rejected even if under the
            absolute limit.  The round-4 storm showed why: with healthy norms
            5-50 and a fixed limit of 500, steps at GNorm 100-500 (2-10x
            healthy — the divergence ramp) kept being ACCEPTED, re-walking
            the trunk to the gain cliff between rollbacks.  0 disables.
            The reference tracks each guard's own gradient scale, so the
            discriminator (whose band differs from G's) self-calibrates.
        backoff: each rollback multiplies ``lr_scale`` by this (0/1 disables
            the adaptive scale); ``recover_after`` consecutive accepted steps
            double it back toward 1.0.

    Returns:
        (params, ema, opt_state, guard, info) — info carries the raw
        ``grad_norm``, the applied ``lr_scale``, and 0/1 ``rejected`` /
        ``rollback`` flags.
    """
    gnorm = optax.global_norm(grads)
    ok = jnp.isfinite(gnorm)
    if reject_limit:
        ok = ok & (gnorm < reject_limit)
    if reject_mult:
        adaptive_limit = reject_mult * guard.gnorm_ref
        ok = ok & ((guard.gnorm_ref <= 0.0) | (gnorm < adaptive_limit))

    # Feed zeros on rejected steps (cheaper than a cond; results discarded),
    # then discard both the update and the optimizer-state advance.
    safe_grads = jax.tree_util.tree_map(
        lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
    updates, new_opt = tx.update(safe_grads, opt_state, params)
    scale = jnp.where(ok, guard.lr_scale, 0.0)
    updates = jax.tree_util.tree_map(
        lambda u: u * scale.astype(u.dtype), updates)
    new_opt = tree_select(ok, new_opt, opt_state)

    new_params = optax.apply_updates(params, updates)
    new_ema = tree_select(ok, ema_update(ema, new_params, ema_decay), ema)

    streak = jnp.where(ok, 0, guard.reject_streak + 1)
    if rollback_after:
        roll = streak >= rollback_after
        new_params = tree_select(roll, new_ema, new_params)
        new_opt = _zero_float_leaves(roll, new_opt)
        # a backoff trigger with no rollback target: an 8-rejection streak
        # still halves lr_scale (and resets the streak) so a rollback-free
        # guard — the discriminator's — has an escape path instead of
        # freezing forever on persistently-large gradients
        trigger = roll
    else:
        roll = jnp.zeros((), jnp.bool_)
        trigger = streak >= 8
    streak = jnp.where(trigger, 0, streak)

    lr_scale = guard.lr_scale
    accept_streak = jnp.where(ok, guard.accept_streak + 1,
                              jnp.zeros((), jnp.int32))
    if backoff and backoff != 1.0:
        lr_scale = jnp.where(trigger, jnp.maximum(lr_scale * backoff,
                                                  lr_scale_floor), lr_scale)
        recover = accept_streak >= recover_after
        lr_scale = jnp.where(recover, jnp.minimum(lr_scale * 2.0, 1.0),
                             lr_scale)
        accept_streak = jnp.where(recover, 0, accept_streak)

    # track the accepted-norm running average (seed it with the first
    # accepted norm; frozen during rejections so a storm cannot inflate it)
    if gnorm_ref_decay < 1.0:
        seeded = jnp.where(guard.gnorm_ref > 0.0,
                           gnorm_ref_decay * guard.gnorm_ref
                           + (1.0 - gnorm_ref_decay) * gnorm,
                           gnorm)
        gnorm_ref = jnp.where(ok, seeded, guard.gnorm_ref)
    else:
        gnorm_ref = guard.gnorm_ref

    new_guard = GuardState(
        reject_streak=streak,
        rejected_total=guard.rejected_total + (~ok).astype(jnp.int32),
        rollback_total=guard.rollback_total + roll.astype(jnp.int32),
        accept_streak=accept_streak,
        lr_scale=lr_scale,
        gnorm_ref=gnorm_ref)
    info = {"grad_norm": gnorm,
            "lr_scale": guard.lr_scale,  # the scale THIS step applied
            "rejected": (~ok).astype(jnp.float32),
            "rollback": roll.astype(jnp.float32)}
    return new_params, new_ema, new_opt, new_guard, info
