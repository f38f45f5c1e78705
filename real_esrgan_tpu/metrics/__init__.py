from real_esrgan_tpu.metrics.niqe import NIQE, niqe, niqe_features
