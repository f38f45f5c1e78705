from real_esrgan_tpu.utils.imgio import (
    load_image_rgb, save_image_rgb, image_to_array, array_to_image,
)
from real_esrgan_tpu.utils.meters import AverageMeter, ProgressMeter
