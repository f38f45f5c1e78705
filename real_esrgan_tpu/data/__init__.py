from real_esrgan_tpu.data.dataset import (
    TrainImageDataset, ValidImageDataset, TestImageDataset, ThreadedLoader,
    build_eval_datasets,
)
from real_esrgan_tpu.data.prefetcher import CPUPrefetcher, DevicePrefetcher
from real_esrgan_tpu.data.device_pool import DevicePoolLoader, build_pool_array
