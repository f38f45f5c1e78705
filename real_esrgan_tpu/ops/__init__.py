from real_esrgan_tpu.ops.color import (
    rgb2ycbcr, bgr2ycbcr, ycbcr2rgb, ycbcr2bgr, rgb_to_grayscale,
)
from real_esrgan_tpu.ops.filter2d import filter2d
from real_esrgan_tpu.ops.resize import (
    matlab_resize, resize_fixed, resize_dynamic, make_matlab_resize_matrix,
)
from real_esrgan_tpu.ops.blur_kernels import (
    bivariate_kernel_grid, sinc_kernel_grid, random_mixed_kernel,
    random_first_order_kernel, random_second_order_kernel, random_final_sinc_kernel,
)
from real_esrgan_tpu.ops.noise import (
    gaussian_noise, poisson_noise,
    random_add_gaussian_noise, random_add_poisson_noise,
)
from real_esrgan_tpu.ops.diffjpeg import diff_jpeg, quality_to_factor
from real_esrgan_tpu.ops.usm import usm_sharpen, gaussian_kernel_1d
from real_esrgan_tpu.ops.augment import (
    center_crop, paired_random_crop, random_orientation, apply_orientation,
)
