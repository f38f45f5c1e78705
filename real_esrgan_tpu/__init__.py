"""TPU-native Real-ESRGAN framework (JAX / XLA / Pallas / pjit).

A from-scratch re-design of the capabilities of Lornatang/Real_ESRGAN-PyTorch
for TPU hardware: the RRDB generator, spectral-norm U-Net discriminator,
on-device second-order degradation synthesis, NIQE evaluation, and the two
training stages — all built on functional JAX with explicit RNG keys,
NHWC layouts, static shapes, and `jax.sharding` data parallelism.
"""

__version__ = "0.1.0"


def _enable_persistent_compilation_cache():
    """Persist XLA executables across processes (first compiles of the fused
    train step are minutes on a relayed TPU; this makes re-runs instant)."""
    import os

    import jax

    cache_dir = os.environ.get(
        "REAL_ESRGAN_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "real_esrgan_tpu_xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization; never block import
        pass


_enable_persistent_compilation_cache()
