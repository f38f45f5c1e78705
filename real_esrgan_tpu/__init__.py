"""TPU-native Real-ESRGAN framework (JAX / XLA / Pallas / pjit).

A from-scratch re-design of the capabilities of Lornatang/Real_ESRGAN-PyTorch
for TPU hardware: the RRDB generator, spectral-norm U-Net discriminator,
on-device second-order degradation synthesis, NIQE evaluation, and the two
training stages — all built on functional JAX with explicit RNG keys,
NHWC layouts, static shapes, and `jax.sharding` data parallelism.
"""

__version__ = "0.1.0"
