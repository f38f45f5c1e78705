"""Optimizer hygiene: a gradient explosion must cost one skipped step, not
the whole run.

Regression for a measured production failure: an InEnv10 stage-1 run hit one
gradient-overflow step around epoch ~180; Adam's second moment became inf
(``nu = b2*nu + (1-b2)*g**2`` never decays an inf), every later update was
exactly zero, and the trainer spent 300 epochs training a frozen model
(g_last's opt_state carried 16.68M infs — exactly the nu tree).  The
reference has no guard either (/root/reference/train_realesrnet.py:258-394
steps the raw AMP gradients into Adam); harden_optimizer adds global-norm
clipping + optax.apply_if_finite to both trainers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from real_esrgan_tpu.configuration import GanTrainConfig, TrainConfig
from real_esrgan_tpu.train.esrgan import build_optimizers
from real_esrgan_tpu.train.esrnet import (
    build_optimizer, harden_optimizer, notfinite_count,
)

PARAMS = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}


def _grads(value):
    return jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, value), PARAMS)


def test_inf_gradient_step_is_skipped_and_recoverable():
    tx = build_optimizer(TrainConfig(), steps_per_epoch=10)
    opt_state = tx.init(PARAMS)

    updates, opt_state = tx.update(_grads(jnp.inf), opt_state, PARAMS)
    assert all(np.all(np.asarray(u) == 0)
               for u in jax.tree_util.tree_leaves(updates))
    assert notfinite_count(opt_state) == 1

    # the very next finite gradient must produce a real, finite update
    updates, opt_state = tx.update(_grads(0.5), opt_state, PARAMS)
    leaves = jax.tree_util.tree_leaves(updates)
    assert all(np.isfinite(np.asarray(u)).all() for u in leaves)
    assert any(np.any(np.asarray(u) != 0) for u in leaves)
    assert notfinite_count(opt_state) == 1  # not incremented by a good step


def test_nan_gradient_step_is_skipped():
    tx = build_optimizer(TrainConfig(), steps_per_epoch=10)
    opt_state = tx.init(PARAMS)
    updates, opt_state = tx.update(_grads(jnp.nan), opt_state, PARAMS)
    assert all(np.all(np.asarray(u) == 0)
               for u in jax.tree_util.tree_leaves(updates))
    assert notfinite_count(opt_state) == 1


def test_huge_finite_gradient_cannot_poison_adam():
    """g = 1e30 is finite, but g**2 overflows f32 to inf — exactly how the
    production run died.  The hardened chain must keep every optimizer-state
    leaf finite and keep producing nonzero updates afterwards."""
    tx = build_optimizer(TrainConfig(), steps_per_epoch=10)
    opt_state = tx.init(PARAMS)

    _, opt_state = tx.update(_grads(1e30), opt_state, PARAMS)
    assert all(np.isfinite(np.asarray(leaf)).all()
               for leaf in jax.tree_util.tree_leaves(opt_state))

    updates, opt_state = tx.update(_grads(0.5), opt_state, PARAMS)
    leaves = jax.tree_util.tree_leaves(updates)
    assert all(np.isfinite(np.asarray(u)).all() for u in leaves)
    assert any(np.any(np.asarray(u) != 0) for u in leaves)


def test_clipping_bounds_update_scale():
    """With clip=1.0 the post-clip gradient entering Adam has global norm
    <= 1: a 1e6x larger gradient must not produce a 1e6x larger update."""
    cfg = TrainConfig(grad_clip_norm=1.0, skip_nonfinite_updates=False)
    # plain SGD isolates the clip from Adam's own normalization
    tx = harden_optimizer(optax.sgd(1.0), cfg)
    opt_state = tx.init(PARAMS)
    u_small, _ = tx.update(_grads(1e-3), opt_state, PARAMS)
    u_big, _ = tx.update(_grads(1e3), opt_state, PARAMS)
    n_small = float(optax.global_norm(u_small))
    n_big = float(optax.global_norm(u_big))
    assert n_big <= 1.0 + 1e-5
    assert n_big < n_small * 1e5


def test_gan_optimizers_are_hardened():
    g_tx, d_tx = build_optimizers(GanTrainConfig(), steps_per_epoch=10)
    for tx in (g_tx, d_tx):
        opt_state = tx.init(PARAMS)
        updates, opt_state = tx.update(_grads(jnp.inf), opt_state, PARAMS)
        assert all(np.all(np.asarray(u) == 0)
                   for u in jax.tree_util.tree_leaves(updates))
        assert notfinite_count(opt_state) == 1


def test_many_consecutive_nonfinite_steps_never_poison():
    """optax.apply_if_finite 'gives up and ACCEPTS' the raw update after
    max_consecutive_errors — which would re-introduce the poisoning.  The
    hardened chain pins the limit high enough that a long streak of bad
    steps still only ever produces zero updates."""
    tx = build_optimizer(TrainConfig(), steps_per_epoch=10)
    opt_state = tx.init(PARAMS)
    for _ in range(150):
        updates, opt_state = tx.update(_grads(jnp.inf), opt_state, PARAMS)
    assert all(np.all(np.asarray(u) == 0)
               for u in jax.tree_util.tree_leaves(updates))
    assert notfinite_count(opt_state) == 150
    assert all(np.isfinite(np.asarray(leaf)).all()
               for leaf in jax.tree_util.tree_leaves(opt_state))


def test_grad_clip_zero_disables_hardening_chain():
    cfg = TrainConfig(grad_clip_norm=0.0, skip_nonfinite_updates=False)
    tx = build_optimizer(cfg, steps_per_epoch=10)
    opt_state = tx.init(PARAMS)
    assert notfinite_count(opt_state) == 0  # plain Adam state: no counter
    u, _ = tx.update(_grads(0.5), opt_state, PARAMS)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(u))
