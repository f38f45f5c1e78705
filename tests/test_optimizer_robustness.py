"""Training self-healing: gradient divergence must cost a few rejected steps
and (at worst) one EMA rollback — never the run.

Regressions for two measured production failures on InEnv10 stage-1 (full
post-mortem in real_esrgan_tpu/train/guard.py):

1. one gradient-overflow step made raw Adam's second moment inf FOREVER
   (``nu = b2*nu + (1-b2)*g**2`` never decays an inf) — the run silently
   trained a frozen model for 300 epochs;
2. the RRDB trunk went super-critical (forward amplifies ~1e22 with params
   maxabs 0.19, f32 and bf16 alike), after which merely SKIPPING non-finite
   updates (optax.apply_if_finite) froze the run at the diverged weights:
   every later batch exploded too, so every update was rejected forever.

The guard (train/guard.py) rejects non-finite/outlier updates AND rolls
params back to the EMA after ``rollback_after`` consecutive rejections, so
training resumes from pre-divergence weights.  The reference has no guard at
all (/root/reference/train_realesrnet.py:258-394 steps raw AMP gradients
into Adam).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from real_esrgan_tpu.configuration import GanTrainConfig, TrainConfig
from real_esrgan_tpu.train.esrgan import build_optimizers
from real_esrgan_tpu.train.esrnet import (
    build_optimizer, harden_optimizer, notfinite_count, rollback_count,
)
from real_esrgan_tpu.train.guard import guard_init, guarded_update

PARAMS = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
EMA = {"w": jnp.full((4, 4), 2.0), "b": jnp.full((4,), 3.0)}


def _grads(value):
    return jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, value), PARAMS)


def _tree_equal(a, b):
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(jax.tree_util.tree_leaves(a),
                               jax.tree_util.tree_leaves(b)))


def _step(tx, grads, opt_state, params, ema, guard, **kw):
    kw.setdefault("reject_limit", 500.0)
    kw.setdefault("rollback_after", 4)
    kw.setdefault("ema_decay", 0.9)
    return guarded_update(tx, grads, opt_state, params, ema, guard, **kw)


def test_inf_gradient_step_is_rejected_and_recoverable():
    tx = build_optimizer(TrainConfig(), steps_per_epoch=10)
    opt_state = tx.init(PARAMS)
    guard = guard_init()

    params, ema, opt_state2, guard, info = _step(
        tx, _grads(jnp.inf), opt_state, PARAMS, EMA, guard)
    assert _tree_equal(params, PARAMS)          # params untouched
    assert _tree_equal(ema, EMA)                # ema untouched
    assert _tree_equal(opt_state2, opt_state)   # optimizer state untouched
    assert notfinite_count(guard) == 1
    assert float(info["rejected"]) == 1.0

    # the very next finite gradient must produce a real, finite update
    params, ema, opt_state3, guard, info = _step(
        tx, _grads(0.5), opt_state2, PARAMS, EMA, guard)
    assert float(info["rejected"]) == 0.0
    assert not _tree_equal(params, PARAMS)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(params))
    assert notfinite_count(guard) == 1  # not incremented by a good step
    assert int(guard.reject_streak) == 0


def test_nan_gradient_step_is_rejected():
    tx = build_optimizer(TrainConfig(), steps_per_epoch=10)
    guard = guard_init()
    params, _, _, guard, _ = _step(
        tx, _grads(jnp.nan), tx.init(PARAMS), PARAMS, EMA, guard)
    assert _tree_equal(params, PARAMS)
    assert notfinite_count(guard) == 1


def test_huge_finite_gradient_cannot_poison_adam():
    """g = 1e30 is finite, but its global norm overflows f32 to inf — exactly
    how the first production run died.  The guard must reject it and keep
    every optimizer-state leaf finite."""
    tx = build_optimizer(TrainConfig(), steps_per_epoch=10)
    guard = guard_init()
    params, _, opt_state, guard, info = _step(
        tx, _grads(1e30), tx.init(PARAMS), PARAMS, EMA, guard)
    assert _tree_equal(params, PARAMS)
    assert all(np.isfinite(np.asarray(leaf)).all()
               for leaf in jax.tree_util.tree_leaves(opt_state))
    assert notfinite_count(guard) == 1

    params, _, opt_state, guard, _ = _step(
        tx, _grads(0.5), opt_state, PARAMS, EMA, guard)
    assert not _tree_equal(params, PARAMS)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(params))


def test_outlier_finite_gradient_is_rejected():
    """The divergence ramp produces finite gradients far above the healthy
    band (5-50 measured) long before they overflow: a global norm over
    reject_limit must be rejected outright."""
    tx = build_optimizer(TrainConfig(), steps_per_epoch=10)
    guard = guard_init()
    big = _grads(1e3)  # global norm ~4.5e3 > 500
    params, _, _, guard, info = _step(
        tx, big, tx.init(PARAMS), PARAMS, EMA, guard)
    assert _tree_equal(params, PARAMS)
    assert float(info["rejected"]) == 1.0
    # under the limit: accepted
    guard2 = guard_init()
    params, _, _, guard2, info = _step(
        tx, _grads(10.0), tx.init(PARAMS), PARAMS, EMA, guard2)
    assert float(info["rejected"]) == 0.0
    assert not _tree_equal(params, PARAMS)


def test_rollback_restores_ema_and_resets_moments():
    """After rollback_after consecutive rejections, params must come back as
    the EMA and Adam's float moments must be zeroed (integer schedule counts
    preserved) — the un-freeze that apply_if_finite could not provide."""
    tx = build_optimizer(TrainConfig(), steps_per_epoch=10)
    opt_state = tx.init(PARAMS)
    guard = guard_init()

    # a few healthy steps first so Adam's moments are nonzero
    params, ema = PARAMS, EMA
    for _ in range(3):
        params, ema, opt_state, guard, _ = _step(
            tx, _grads(0.5), opt_state, params, ema, guard)
    mu_nonzero = any(np.any(np.asarray(l) != 0) for l in
                     jax.tree_util.tree_leaves(opt_state)
                     if np.issubdtype(np.asarray(l).dtype, np.floating))
    assert mu_nonzero
    ema_before = jax.device_get(ema)

    rolled = False
    for i in range(4):
        params, ema, opt_state, guard, info = _step(
            tx, _grads(jnp.nan), opt_state, params, ema, guard)
        rolled = rolled or bool(info["rollback"])
    assert rolled
    assert rollback_count(guard) == 1
    assert notfinite_count(guard) == 4
    assert int(guard.reject_streak) == 0  # reset by the rollback
    assert _tree_equal(params, ema_before)   # params <- EMA
    assert _tree_equal(ema, ema_before)      # EMA itself untouched
    for leaf in jax.tree_util.tree_leaves(opt_state):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating):
            assert np.all(arr == 0)           # moments forgotten
        else:
            assert np.all(arr >= 3)           # schedule count preserved

    # training must resume normally from the rolled-back weights
    params2, _, _, guard, info = _step(
        tx, _grads(0.5), opt_state, params, ema, guard)
    assert float(info["rejected"]) == 0.0
    assert not _tree_equal(params2, params)


def test_rollback_disabled_for_ema_free_optimizee():
    """rollback_after=0 (the discriminator): rejections never touch params."""
    tx = build_optimizer(TrainConfig(), steps_per_epoch=10)
    opt_state = tx.init(PARAMS)
    guard = guard_init()
    params = PARAMS
    for _ in range(10):
        params, _, opt_state, guard, info = _step(
            tx, _grads(jnp.inf), opt_state, params, PARAMS, guard,
            rollback_after=0)
        assert float(info["rollback"]) == 0.0
    assert _tree_equal(params, PARAMS)
    assert notfinite_count(guard) == 10
    assert rollback_count(guard) == 0


def test_long_rejection_streak_never_accepts():
    """A long streak must keep rejecting (and keep rolling back) rather than
    ever 'give up and accept' the bad update, which is how
    optax.apply_if_finite re-poisons after max_consecutive_errors."""
    tx = build_optimizer(TrainConfig(), steps_per_epoch=10)
    opt_state = tx.init(PARAMS)
    guard = guard_init()
    params, ema = PARAMS, EMA
    for _ in range(150):
        params, ema, opt_state, guard, _ = _step(
            tx, _grads(jnp.inf), opt_state, params, ema, guard)
    assert notfinite_count(guard) == 150
    assert rollback_count(guard) == 150 // 4
    assert _tree_equal(ema, EMA)            # EMA never polluted
    assert _tree_equal(params, EMA)         # held at the rollback target
    assert all(np.isfinite(np.asarray(leaf)).all()
               for leaf in jax.tree_util.tree_leaves(opt_state))


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


def test_gan_optimizers_accept_guarded_updates():
    g_tx, d_tx = build_optimizers(GanTrainConfig(), steps_per_epoch=10)
    for tx in (g_tx, d_tx):
        guard = guard_init()
        params, _, _, guard, info = _step(
            tx, _grads(jnp.inf), tx.init(PARAMS), PARAMS, EMA, guard)
        assert _tree_equal(params, PARAMS)
        assert notfinite_count(guard) == 1


def test_grad_clip_zero_disables_hardening_chain():
    cfg = TrainConfig(grad_clip_norm=0.0, skip_nonfinite_updates=False)
    tx = build_optimizer(cfg, steps_per_epoch=10)
    opt_state = tx.init(PARAMS)
    u, _ = tx.update(_grads(0.5), opt_state, PARAMS)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(u))


def test_train_step_rejects_divergence_and_rolls_back_end_to_end():
    """Wiring test through the REAL jitted ESRNet step (make_train_step):
    poison params to super-critical magnitudes (the production signature:
    output clamp keeps the loss finite, the straight-through clamp gradient
    carries ~1e20s into the grads), then assert the guard rejects every
    step, rolls back to the EMA after 4, and that training resumes from the
    restored weights."""
    from real_esrgan_tpu.configuration import (
        DegradationConfig, KernelSynthesisConfig, ModelConfig,
        PipelineGeometry,
    )
    from real_esrgan_tpu.train.esrnet import (
        build_generator, init_state, make_train_step,
    )

    geo = PipelineGeometry(hr_size=64, crop_size=32, scale=4)
    cfg = TrainConfig(batch_size=4, use_bfloat16=False, remat_rrdb=False)
    model = build_generator(ModelConfig(num_rrdb=1, channels=16,
                                        growth_channels=8), cfg)
    tx = build_optimizer(cfg, steps_per_epoch=10)
    state = init_state(jax.random.PRNGKey(0), model, tx, geo)
    step_fn = make_train_step(model, tx, geo, KernelSynthesisConfig(),
                              DegradationConfig(usm_radius=13), cfg.ema_decay,
                              reject_limit=500.0, rollback_after=4)
    healthy = jax.device_get(state.params)   # == the EMA at init
    state = state.replace(params=jax.tree_util.tree_map(
        lambda p: p * 1e20, state.params))

    hr = (np.random.default_rng(3).random((4, 64, 64, 3)) * 255).astype(np.uint8)
    for i in range(4):
        state, metrics = step_fn(state, jnp.asarray(hr), jax.random.PRNGKey(i))
        assert float(metrics["rejected"]) == 1.0, i
    assert rollback_count(state.guard) == 1
    assert notfinite_count(state.guard) == 4
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(
                jax.device_get(state.params))[0],
            jax.tree_util.tree_flatten_with_path(healthy)[0]):
        np.testing.assert_array_equal(a, b, err_msg=str(ka))

    # training must resume normally from the restored weights
    state, metrics = step_fn(state, jnp.asarray(hr), jax.random.PRNGKey(9))
    assert float(metrics["rejected"]) == 0.0
    assert np.isfinite(float(metrics["loss"]))
    assert rollback_count(state.guard) == 1


def test_gan_step_guards_generator_and_discriminator_independently():
    """Wiring test through the REAL fused GAN step (make_gan_train_step):
    super-critical G params explode the G grads AND poison sr.detach()
    (inf activations turn into NaN through the clamp), so BOTH guards must
    reject during the divergence.  The G guard must roll G back to its EMA
    after 4 rejections; the D guard is reject-only (no EMA target) and must
    never roll back — D's params simply hold until its input is healthy.
    After the G rollback, both optimizees must train normally again."""
    from real_esrgan_tpu.configuration import (
        DegradationConfig, GanTrainConfig, KernelSynthesisConfig,
        ModelConfig, PipelineGeometry,
    )
    from real_esrgan_tpu.train.esrgan import (
        build_models, build_optimizers, init_gan_state, make_gan_train_step,
    )

    geo = PipelineGeometry(hr_size=64, crop_size=64, scale=4)
    cfg = GanTrainConfig(batch_size=4, use_bfloat16=False, remat_rrdb=False)
    model_cfg = ModelConfig(num_rrdb=1, channels=16, growth_channels=8)
    generator, discriminator, vgg = build_models(model_cfg, cfg)
    g_tx, d_tx = build_optimizers(cfg, steps_per_epoch=10)
    state = init_gan_state(jax.random.PRNGKey(0), generator, discriminator,
                           g_tx, d_tx, geo)
    vgg_params = vgg.init(jax.random.PRNGKey(3),
                          jnp.zeros((1, 64, 64, 3)))["params"]
    step_fn = make_gan_train_step(generator, discriminator, vgg, vgg_params,
                                  g_tx, d_tx, geo, KernelSynthesisConfig(),
                                  DegradationConfig(usm_radius=13), cfg)
    healthy_g = jax.device_get(state.g_params)   # == the G EMA at init
    state = state.replace(g_params=jax.tree_util.tree_map(
        lambda p: p * 1e20, state.g_params))

    hr = (np.random.default_rng(5).random((4, 64, 64, 3)) * 255).astype(np.uint8)
    for i in range(4):
        state, metrics = step_fn(state, jnp.asarray(hr), jax.random.PRNGKey(i))
        assert float(metrics["g_rejected"]) == 1.0, i
    assert rollback_count(state.g_guard) == 1
    assert notfinite_count(state.g_guard) == 4
    assert rollback_count(state.d_guard) == 0  # reject-only: never rolls back
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(
                jax.device_get(state.g_params))[0],
            jax.tree_util.tree_flatten_with_path(healthy_g)[0]):
        np.testing.assert_array_equal(a, b, err_msg=str(ka))

    # both optimizees train normally from the restored weights
    state, metrics = step_fn(state, jnp.asarray(hr), jax.random.PRNGKey(9))
    assert float(metrics["g_rejected"]) == 0.0
    assert float(metrics["d_rejected"]) == 0.0
    assert np.isfinite(float(metrics["g_loss"]))


def test_rollback_halves_lr_scale_with_floor():
    """Each rollback must halve the adaptive update scale (the escape from
    a rollback STORM: at full LR every path from the EMA led back over the
    cliff — measured 39% rejection rate by epoch 271), floored at 1/64."""
    tx = build_optimizer(TrainConfig(), steps_per_epoch=10)
    opt_state = tx.init(PARAMS)
    guard = guard_init()
    params, ema = PARAMS, EMA
    assert float(guard.lr_scale) == 1.0
    for k in range(1, 9):  # 8 rollbacks: 0.5 ... floor
        for _ in range(4):
            params, ema, opt_state, guard, _ = _step(
                tx, _grads(jnp.nan), opt_state, params, ema, guard)
        assert float(guard.lr_scale) == max(0.5 ** k, 1 / 64), k
    assert float(guard.lr_scale) == 1 / 64


def test_accept_streak_recovers_lr_scale():
    """recover_after consecutive accepted steps double lr_scale (cap 1.0):
    the guard re-accelerates once the trajectory is demonstrably stable."""
    tx = build_optimizer(TrainConfig(), steps_per_epoch=10)
    opt_state = tx.init(PARAMS)
    guard = guard_init()
    params, ema = PARAMS, EMA
    for _ in range(8):  # two rollbacks -> lr_scale 0.25
        params, ema, opt_state, guard, _ = _step(
            tx, _grads(jnp.nan), opt_state, params, ema, guard)
    assert float(guard.lr_scale) == 0.25
    for i in range(6):  # recover_after=3 here: doubles at steps 3 and 6
        params, ema, opt_state, guard, info = _step(
            tx, _grads(0.5), opt_state, params, ema, guard, recover_after=3)
    assert float(guard.lr_scale) == 1.0
    # capped at 1.0 no matter how long the healthy streak continues
    for _ in range(4):
        params, ema, opt_state, guard, _ = _step(
            tx, _grads(0.5), opt_state, params, ema, guard, recover_after=3)
    assert float(guard.lr_scale) == 1.0


def test_lr_scale_multiplies_update_magnitude():
    """An accepted update under lr_scale=s must be exactly s times the
    update at full scale (scaling the update == scaling Adam's lr)."""
    tx = build_optimizer(TrainConfig(grad_clip_norm=0.0), steps_per_epoch=10)
    guard_full = guard_init()
    p_full, _, _, _, _ = _step(
        tx, _grads(0.5), tx.init(PARAMS), PARAMS, EMA, guard_full)
    guard_half = guard_init().replace(lr_scale=jnp.float32(0.5))
    p_half, _, _, _, info = _step(
        tx, _grads(0.5), tx.init(PARAMS), PARAMS, EMA, guard_half)
    assert float(info["lr_scale"]) == 0.5
    for (ka, pf), (kb, ph), (kc, p0) in zip(
            jax.tree_util.tree_flatten_with_path(p_full)[0],
            jax.tree_util.tree_flatten_with_path(p_half)[0],
            jax.tree_util.tree_flatten_with_path(PARAMS)[0]):
        # atol = ulp(1.0): extracting the delta near p0=1 quantizes it to
        # the f32 grid at 1.0, which dominates the comparison error
        np.testing.assert_allclose(np.asarray(ph) - np.asarray(p0),
                                   (np.asarray(pf) - np.asarray(p0)) * 0.5,
                                   rtol=1e-6, atol=1.2e-7, err_msg=str(ka))


def test_adaptive_limit_rejects_divergence_ramp_steps():
    """Round-4 storm signature: with healthy norms ~10, steps at GNorm
    100-500 (under the fixed 500 limit, 10x the healthy band) kept being
    ACCEPTED and re-walked the trunk to the gain cliff.  Once gnorm_ref has
    history, reject_mult * ref must reject them."""
    tx = build_optimizer(TrainConfig(), steps_per_epoch=10)
    opt_state = tx.init(PARAMS)
    guard = guard_init()
    # build history at ~norm(0.5 grads): global norm ~2.24
    for _ in range(5):
        params, ema, opt_state, guard, info = _step(
            tx, _grads(0.5), opt_state, PARAMS, EMA, guard)
        assert float(info["rejected"]) == 0.0
    ref = float(guard.gnorm_ref)
    assert ref > 0.0
    # a step at 40x the reference norm is under the fixed 500 limit but far
    # over reject_mult (8) x ref — must be rejected
    ramp = _grads(20.0)  # global norm ~89.4 < 500
    params, _, _, guard, info = _step(
        tx, ramp, opt_state, PARAMS, EMA, guard)
    assert float(info["rejected"]) == 1.0
    assert _tree_equal(params, PARAMS)
    # rejected steps must NOT inflate the reference
    assert float(guard.gnorm_ref) == ref


def test_adaptive_limit_inactive_without_history():
    """Before any accepted step, gnorm_ref==0 and only the fixed limit
    applies — a cold start's first (often larger) gradients aren't rejected."""
    tx = build_optimizer(TrainConfig(), steps_per_epoch=10)
    guard = guard_init()
    params, _, _, guard, info = _step(
        tx, _grads(10.0), tx.init(PARAMS), PARAMS, EMA, guard)
    assert float(info["rejected"]) == 0.0
    assert float(guard.gnorm_ref) > 0.0  # seeded by the first accepted norm


def test_reject_mult_zero_disables_adaptive_limit():
    tx = build_optimizer(TrainConfig(), steps_per_epoch=10)
    opt_state = tx.init(PARAMS)
    guard = guard_init()
    for _ in range(3):
        params, ema, opt_state, guard, _ = _step(
            tx, _grads(0.5), opt_state, PARAMS, EMA, guard, reject_mult=0.0)
    # 40x the recent norm, still under the fixed limit: accepted
    params, _, _, guard, info = _step(
        tx, _grads(20.0), opt_state, PARAMS, EMA, guard, reject_mult=0.0)
    assert float(info["rejected"]) == 0.0


def test_rollback_free_guard_backs_off_lr_scale_on_streak():
    """ADVICE r4: the discriminator guard (rollback_after=0) had no escape
    path — persistent rejections froze D forever at full lr_scale.  An
    8-rejection streak must now halve lr_scale (and reset the streak)."""
    tx = build_optimizer(TrainConfig(), steps_per_epoch=10)
    opt_state = tx.init(PARAMS)
    guard = guard_init()
    for i in range(8):
        params, _, opt_state, guard, _ = _step(
            tx, _grads(jnp.inf), opt_state, PARAMS, PARAMS, guard,
            rollback_after=0)
    assert float(guard.lr_scale) == 0.5
    assert int(guard.reject_streak) == 0
    assert rollback_count(guard) == 0  # no rollback ever happens


def test_guard_dict_roundtrip_and_missing_fields():
    from real_esrgan_tpu.train.guard import (
        GuardState, guard_from_dict, guard_to_dict,
    )

    guard = guard_init().replace(
        rejected_total=jnp.int32(7), lr_scale=jnp.float32(0.25),
        gnorm_ref=jnp.float32(12.5))
    d = guard_to_dict(guard)
    back = guard_from_dict({k: np.asarray(v) for k, v in d.items()})
    assert int(back.rejected_total) == 7
    assert float(back.lr_scale) == 0.25
    assert float(back.gnorm_ref) == 12.5
    # an old checkpoint without gnorm_ref: fresh default, no scramble
    d.pop("gnorm_ref")
    back = guard_from_dict(d)
    assert float(back.gnorm_ref) == 0.0
    assert float(back.lr_scale) == 0.25
    # no dict at all (pre-round-5 checkpoints): fresh init
    fresh = guard_from_dict(None)
    assert float(fresh.lr_scale) == 1.0


def test_storm_then_recover_converges():
    """Outcome-level regression (VERDICT r4 weak #6): a storm-then-recover
    trajectory — healthy steps, a 20-step divergence storm (rollback +
    lr_scale backoff + zeroed Adam moments), then healthy steps again — must
    actually CONVERGE on a real optimization problem, not merely survive.
    Unit mechanics alone never showed the post-rollback state can train."""
    import dataclasses

    target = {"w": jnp.full((4, 4), 3.0), "b": jnp.full((4,), -2.0)}

    def loss_and_grads(params):
        diff = jax.tree_util.tree_map(lambda p, t: p - t, params, target)
        loss = sum(float(jnp.sum(d * d)) for d in
                   jax.tree_util.tree_leaves(diff)) / 2.0
        return loss, diff

    tx = build_optimizer(dataclasses.replace(TrainConfig(), lr=0.05),
                         steps_per_epoch=10**6)
    params = {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,))}
    ema = jax.tree_util.tree_map(jnp.copy, params)
    opt_state = tx.init(params)
    guard = guard_init()

    def run(n, make_grads, params, ema, opt_state, guard):
        for _ in range(n):
            _, grads = loss_and_grads(params)
            grads = make_grads(grads)
            params, ema, opt_state, guard, _ = _step(
                tx, grads, opt_state, params, ema, guard,
                ema_decay=0.95, recover_after=16)
        return params, ema, opt_state, guard

    # phase 1: 60 healthy steps
    params, ema, opt_state, guard = run(
        60, lambda g: g, params, ema, opt_state, guard)
    loss_before_storm, _ = loss_and_grads(params)
    assert loss_before_storm < loss_and_grads({"w": jnp.zeros((4, 4)),
                                               "b": jnp.zeros((4,))})[0]

    # phase 2: 20-step storm (non-finite gradients) — rollbacks + backoff
    params, ema, opt_state, guard = run(
        20, lambda g: jax.tree_util.tree_map(
            lambda x: jnp.full_like(x, jnp.inf), g),
        params, ema, opt_state, guard)
    assert rollback_count(guard) >= 4
    assert float(guard.lr_scale) < 1.0

    # phase 3: healthy again — from the rolled-back (EMA) params with zeroed
    # Adam moments and a backed-off lr_scale, training must still converge
    params, ema, opt_state, guard = run(
        200, lambda g: g, params, ema, opt_state, guard)
    loss_after, _ = loss_and_grads(params)
    assert loss_after < loss_before_storm, (loss_after, loss_before_storm)
    assert float(guard.lr_scale) == 1.0  # recover_after doubling restored it
    assert int(guard.reject_streak) == 0
