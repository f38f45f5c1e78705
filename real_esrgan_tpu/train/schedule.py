"""Learning-rate schedules matching the reference's torch schedulers.

* StepLR(step_size, gamma) for RealESRNet (/root/reference/config.py:105-106)
* MultiStepLR(milestones, gamma) for RealESRGAN (config.py:146-147)

Both are expressed as step-indexed schedules using the static steps-per-epoch,
so the LR lives inside the compiled update (jnp-safe for traced steps).

Both accept ``warmup_steps`` — a linear ramp 1/N .. 1 over the first N steps
(0 = reference parity: no warmup).  The reference has none, but its fresh-init
divergences happen inside the first few epochs at full LR (the measured
InEnv10 collapse fired at step 106 of a cold start, docs/ROUND4_NOTES.md);
the ramp covers exactly that window.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def _warmup_factor(step, warmup_steps: int):
    if not warmup_steps:
        return 1.0
    return jnp.minimum((step.astype(jnp.float32) + 1.0) / warmup_steps, 1.0)


def step_lr(base_lr: float, step_size_epochs: int, gamma: float,
            steps_per_epoch: int, warmup_steps: int = 0):
    def schedule(step):
        epoch = step // steps_per_epoch
        lr = base_lr * jnp.power(
            gamma, jnp.asarray(epoch // step_size_epochs, jnp.float32))
        return lr * _warmup_factor(jnp.asarray(step), warmup_steps)

    return schedule


def multistep_lr(base_lr: float, milestones_epochs: Sequence[int], gamma: float,
                 steps_per_epoch: int, warmup_steps: int = 0):
    milestones = jnp.asarray(sorted(milestones_epochs))

    def schedule(step):
        epoch = step // steps_per_epoch
        hits = jnp.sum((epoch >= milestones).astype(jnp.float32))
        lr = base_lr * jnp.power(gamma, hits)
        return lr * _warmup_factor(jnp.asarray(step), warmup_steps)

    return schedule
