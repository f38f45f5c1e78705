"""Exponential moving average of parameters as a pure pytree transform.

Re-design of the reference ``EMA`` module (/root/reference/model.py:30-61):
the shadow weights are just a second pytree updated inside the jitted train
step — no register/apply/restore mutation dance.  Checkpoints store the EMA
tree under ``ema_params`` (the analogue of the reference's "ema_state_dict",
whose ``model.`` prefix consumers strip, /root/reference/inference.py:33).
"""

from __future__ import annotations

import jax


def ema_init(params):
    """shadow <- copy(params) (reference EMA.register, model.py:38-41).

    A real copy, not an alias: the train step donates its input state, and
    aliased params/ema buffers would be donated twice.
    """
    import jax.numpy as jnp

    return jax.tree_util.tree_map(lambda p: jnp.array(p, copy=True), params)


def ema_update(ema, params, decay: float):
    """shadow <- decay * shadow + (1 - decay) * params
    (reference EMA.update, model.py:43-48)."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema, params)
