"""Learning-rate schedules matching the reference's torch schedulers.

* StepLR(step_size, gamma) for RealESRNet (/root/reference/config.py:105-106)
* MultiStepLR(milestones, gamma) for RealESRGAN (config.py:146-147)

Both are expressed as step-indexed schedules using the static steps-per-epoch,
so the LR lives inside the compiled update (jnp-safe for traced steps).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def step_lr(base_lr: float, step_size_epochs: int, gamma: float,
            steps_per_epoch: int):
    def schedule(step):
        epoch = step // steps_per_epoch
        return base_lr * jnp.power(
            gamma, jnp.asarray(epoch // step_size_epochs, jnp.float32))

    return schedule


def multistep_lr(base_lr: float, milestones_epochs: Sequence[int], gamma: float,
                 steps_per_epoch: int):
    milestones = jnp.asarray(sorted(milestones_epochs))

    def schedule(step):
        epoch = step // steps_per_epoch
        hits = jnp.sum((epoch >= milestones).astype(jnp.float32))
        return base_lr * jnp.power(gamma, hits)

    return schedule
