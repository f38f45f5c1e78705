"""Data-parallel correctness: a train step over the 8-device sharded batch
must produce the same updated parameters as the same step with the batch on
one device — the mesh only changes WHERE the math runs, not the math."""

import jax
import jax.numpy as jnp
import numpy as np

from real_esrgan_tpu.configuration import (
    DegradationConfig, KernelSynthesisConfig, ModelConfig, PipelineGeometry,
    TrainConfig,
)
from real_esrgan_tpu.parallel import batch_sharding, make_mesh, replicated_sharding
from real_esrgan_tpu.train.esrnet import (
    build_generator, build_optimizer, init_state, make_train_step,
)

GEO = PipelineGeometry(hr_size=64, crop_size=32, scale=4)
MODEL = ModelConfig(num_rrdb=1, channels=16, growth_channels=8)
CFG = TrainConfig(batch_size=8, use_bfloat16=False, remat_rrdb=False)


def _run_step(shard: bool):
    mesh = make_mesh()
    model = build_generator(MODEL, CFG)
    tx = build_optimizer(CFG, steps_per_epoch=10)
    state = init_state(jax.random.PRNGKey(0), model, tx, GEO)
    step_fn = make_train_step(model, tx, GEO, KernelSynthesisConfig(),
                              DegradationConfig(usm_radius=13), CFG.ema_decay)
    hr = (np.random.default_rng(3).random((8, 64, 64, 3)) * 255).astype(np.uint8)
    if shard:
        state = jax.device_put(state, replicated_sharding(mesh))
        hr = jax.device_put(hr, batch_sharding(mesh))
    else:
        hr = jax.device_put(jnp.asarray(hr), jax.devices()[0])
    state, metrics = step_fn(state, hr, jax.random.PRNGKey(9))
    return jax.device_get(state.params), float(metrics["loss"])


def test_sharded_step_matches_single_device():
    p_sharded, loss_sharded = _run_step(shard=True)
    p_single, loss_single = _run_step(shard=False)
    assert abs(loss_sharded - loss_single) < 1e-5, (loss_sharded, loss_single)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(p_sharded)[0],
            jax.tree_util.tree_flatten_with_path(p_single)[0]):
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=str(ka))
