"""Round-5 divergence fixes: unclamped training loss + LR warmup.

The round-4 root cause (docs/ROUND4_NOTES.md): the generator's in-forward
clamp (/root/reference/model.py:270) makes the L1 loss indifferent to output
magnitude once pixels saturate — clamp(5.0)=1.0 scores zero loss against GT
1.0 and contributes zero gradient under BOTH the hard and straight-through
clamp — so nothing constrains the RRDB trunk's gain in saturating directions
and it can walk super-critical.  Training on the RAW output (basicsr-upstream
behavior) restores the restoring force; these tests pin that property.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from real_esrgan_tpu.models import Generator
from real_esrgan_tpu.train.esrnet import train_forward_model
from real_esrgan_tpu.train.schedule import multistep_lr, step_lr

TINY = dict(num_rrdb=1, channels=8, growth=4)


def test_unclamped_output_escapes_01():
    model = Generator(clamp=False, **TINY)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))["params"]
    # scale conv4 so the raw output is guaranteed out of range
    params = jax.tree_util.tree_map(lambda p: p, params)
    params["conv4"]["bias"] = jnp.full_like(params["conv4"]["bias"], 5.0)
    out = model.apply({"params": params}, jnp.ones((1, 8, 8, 3)) * 0.5)
    assert float(jnp.max(out)) > 1.0  # no clamp

    clamped = Generator(clamp=True, **TINY).apply(
        {"params": params}, jnp.ones((1, 8, 8, 3)) * 0.5)
    assert float(jnp.max(clamped)) <= 1.0


def test_unclamped_loss_penalizes_overshoot_clamped_does_not():
    """THE restoring-force property: for a saturated output (raw value 5,
    GT 1), the clamped L1 loss is zero with zero gradient — the unclamped
    loss is 4 with a gradient pulling the overshoot down."""
    gt = jnp.ones((4,))

    def clamped_loss(x):
        return jnp.mean(jnp.abs(jnp.clip(x, 0.0, 1.0) - gt))

    def raw_loss(x):
        return jnp.mean(jnp.abs(x - gt))

    x = jnp.full((4,), 5.0)
    assert float(clamped_loss(x)) == 0.0
    assert np.allclose(np.asarray(jax.grad(clamped_loss)(x)), 0.0)
    assert float(raw_loss(x)) == 4.0
    g = np.asarray(jax.grad(raw_loss)(x))
    assert (g > 0).all()  # pulls the output DOWN toward range


def test_train_forward_model_modes():
    base = Generator(**TINY)
    none = train_forward_model(base, "none")
    st = train_forward_model(base, "st")
    hard = train_forward_model(base, "hard")
    assert none.clamp is False
    assert st.clamp is True and st.st_clamp is True
    assert hard.clamp is True and hard.st_clamp is False
    # param tree identical across modes: same checkpoint loads everywhere
    p0 = base.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))["params"]
    for m in (none, st, hard):
        out = m.apply({"params": p0}, jnp.ones((1, 8, 8, 3)) * 0.5)
        assert out.shape == (1, 32, 32, 3)
    with pytest.raises(ValueError):
        train_forward_model(base, "bogus")


def test_step_lr_warmup_ramp():
    sched = step_lr(2e-4, step_size_epochs=100, gamma=0.5,
                    steps_per_epoch=10, warmup_steps=100)
    assert float(sched(jnp.int32(0))) == pytest.approx(2e-6)
    assert float(sched(jnp.int32(49))) == pytest.approx(1e-4)
    assert float(sched(jnp.int32(99))) == pytest.approx(2e-4)
    assert float(sched(jnp.int32(500))) == pytest.approx(2e-4)  # post-warmup
    # warmup composes with the decay schedule
    assert float(sched(jnp.int32(1000))) == pytest.approx(1e-4)  # epoch 100


def test_multistep_lr_warmup_ramp():
    sched = multistep_lr(1e-4, milestones_epochs=[10], gamma=0.5,
                         steps_per_epoch=10, warmup_steps=50)
    assert float(sched(jnp.int32(0))) == pytest.approx(2e-6)
    assert float(sched(jnp.int32(49))) == pytest.approx(1e-4)
    assert float(sched(jnp.int32(200))) == pytest.approx(5e-5)  # epoch 20


def test_warmup_zero_is_reference_parity():
    sched = step_lr(2e-4, 100, 0.5, 10)
    assert float(sched(jnp.int32(0))) == pytest.approx(2e-4)
