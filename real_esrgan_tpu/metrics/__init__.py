from real_esrgan_tpu.metrics.niqe import NIQE, niqe_features
