from real_esrgan_tpu.data.dataset import (
    TrainImageDataset, ValidImageDataset, TestImageDataset, ThreadedLoader,
    build_eval_datasets,
)
from real_esrgan_tpu.data.prefetcher import CPUPrefetcher, DevicePrefetcher
