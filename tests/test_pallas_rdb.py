"""Fused Pallas RDB kernel: interpret-mode correctness vs the flax block.

On CPU the kernel runs through the Pallas interpreter (exact same program);
on a real TPU it compiles via Mosaic (exercised by bench/manual runs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from real_esrgan_tpu.models.rrdbnet import ResidualDenseBlock
from real_esrgan_tpu.ops import pallas_rdb as pr


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp)
    yield


def _setup(c=64, g=32, hw=64, batch=2):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, hw, hw, c)).astype(np.float32))
    rdb = ResidualDenseBlock(c, g, dtype=jnp.float32, packed=True)
    params = rdb.init(jax.random.PRNGKey(0), x)["params"]
    kernels = [jnp.asarray(params[f"conv{i}"]["kernel"]) for i in range(1, 6)]
    biases = [jnp.asarray(params[f"conv{i}"]["bias"]) for i in range(1, 6)]
    return x, rdb, params, pr.pack_rdb_weights(kernels, biases, c, g)


def test_fused_rdb_matches_flax(interpret_pallas):
    x, rdb, params, packed = _setup()
    ref = np.array(rdb.apply({"params": params}, x))
    out = np.array(pr.fused_rdb(x, packed, tile=32)).astype(np.float32)
    # kernel computes in bf16; flax ref in f32
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)
    assert np.abs(out - ref).max() < 2e-2


def test_fused_rdb_tile_independence(interpret_pallas):
    """Result must not depend on the tile decomposition."""
    x, rdb, params, packed = _setup(hw=64, batch=1)
    a = np.array(pr.fused_rdb(x, packed, tile=32))
    b = np.array(pr.fused_rdb(x, packed, tile=64))
    np.testing.assert_allclose(a, b, atol=1e-2)
