"""GAN trainer smoke test: fused G+D step runs on the 8-device CPU mesh,
both networks learn, spectral-norm state updates, EMA tracks G."""

import pytest

pytestmark = pytest.mark.heavy

import jax
import jax.numpy as jnp
import numpy as np

from real_esrgan_tpu.configuration import (
    DegradationConfig, GanTrainConfig, KernelSynthesisConfig, ModelConfig,
    PipelineGeometry,
)
from real_esrgan_tpu.parallel import batch_sharding, make_mesh, replicated_sharding
from real_esrgan_tpu.train.esrgan import (
    build_models, build_optimizers, init_gan_state, make_gan_train_step,
)

GEO = PipelineGeometry(hr_size=64, crop_size=64, scale=4)
KCFG = KernelSynthesisConfig()
DCFG = DegradationConfig(usm_radius=13)
MODEL = ModelConfig(num_rrdb=1, channels=16, growth_channels=8)
CFG = GanTrainConfig(batch_size=8, use_bfloat16=True, remat_rrdb=False)


def _l2(a, b):
    return float(sum(jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x, y: jnp.sum((x - y) ** 2), a, b))))


def test_gan_step_runs_and_updates_everything():
    mesh = make_mesh()
    generator, discriminator, vgg = build_models(MODEL, CFG)
    g_tx, d_tx = build_optimizers(CFG, steps_per_epoch=10)
    state = init_gan_state(jax.random.PRNGKey(0), generator, discriminator,
                           g_tx, d_tx, GEO)
    vgg_params = vgg.init(jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)))["params"]
    state = jax.device_put(state, replicated_sharding(mesh))
    vgg_params = jax.device_put(vgg_params, replicated_sharding(mesh))

    step_fn = make_gan_train_step(generator, discriminator, vgg, vgg_params,
                                  g_tx, d_tx, GEO, KCFG, DCFG, CFG)

    rng = np.random.default_rng(0)
    hr = (rng.random((8, 64, 64, 3)) * 255).astype(np.uint8)
    hr = jax.device_put(hr, batch_sharding(mesh))

    g0 = jax.device_get(state.g_params)
    d0 = jax.device_get(state.d_params)
    s0 = jax.device_get(state.d_stats)

    state, metrics = step_fn(state, hr, jax.random.PRNGKey(5))
    m = {k: float(v) for k, v in metrics.items()}
    for name in ("pixel", "content", "adversarial", "g_loss", "d_loss",
                 "d_hr_prob", "d_sr_prob"):
        assert np.isfinite(m[name]), (name, m)
    assert 0.0 <= m["d_hr_prob"] <= 1.0 and 0.0 <= m["d_sr_prob"] <= 1.0

    assert _l2(g0, jax.device_get(state.g_params)) > 0       # G learned
    assert _l2(d0, jax.device_get(state.d_params)) > 0       # D learned
    assert _l2(s0, jax.device_get(state.d_stats)) > 0        # SN u updated
    # EMA lags G
    d_ema = _l2(g0, jax.device_get(state.g_ema))
    d_g = _l2(g0, jax.device_get(state.g_params))
    assert 0 < d_ema < d_g
    assert int(state.step) == 1
