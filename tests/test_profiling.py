"""Profiling helpers: StepTimer steady-state math and trace context."""

import os
import time

from real_esrgan_tpu.utils.profiling import StepTimer, trace


def test_step_timer_discards_warmup():
    t = StepTimer(skip_first=2)
    t.tick()
    for dt in (0.05, 0.04, 0.01, 0.01):  # two slow "compile" steps, two fast
        time.sleep(dt)
        t.tick()
    assert 0.005 < t.steady_mean < 0.03
    assert "ms/step" in t.summary(items_per_step=8)


def test_step_timer_empty():
    t = StepTimer()
    assert t.steady_mean != t.steady_mean  # NaN
    assert t.summary() == "no steady-state samples"


def test_trace_writes_profile(tmp_path):
    import jax
    import jax.numpy as jnp

    logdir = str(tmp_path / "trace")
    with trace(logdir):
        float(jnp.sum(jnp.ones((8, 8)) * 2))
    found = []
    for root, _, files in os.walk(logdir):
        found += files
    assert found, "no trace files written"
