"""Driver entry points: single-chip forward compiles; the full multi-chip
train step compiles and executes on the virtual 8-device mesh."""

import jax
import numpy as np


def test_entry_forward():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 256, 256, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
