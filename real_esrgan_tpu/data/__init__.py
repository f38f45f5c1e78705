from real_esrgan_tpu.data.dataset import (
    TrainImageDataset, ValidImageDataset, TestImageDataset, ThreadedLoader,
)
from real_esrgan_tpu.data.prefetcher import CPUPrefetcher, DevicePrefetcher
