"""Global run configuration — preserves the reference's config-module surface.

The reference drives every entry point from an edited module of constants
(/root/reference/config.py); users flip ``mode`` and edit paths.  This module
keeps that workflow (same names: ``mode``, ``upscale_factor``, ``exp_name``,
``degradation_model_parameters_dict``, ``degradation_process_parameters_dict``,
per-mode path/optimizer constants) while delegating the real configuration to
typed dataclasses in real_esrgan_tpu.configuration.
"""

import dataclasses

from real_esrgan_tpu.configuration import (
    DegradationConfig, GanTrainConfig, KernelSynthesisConfig, ModelConfig,
    PipelineGeometry, TrainConfig,
)

# ---------------------------------------------------------------------------
# Typed configs (the source of truth)
# ---------------------------------------------------------------------------
kernel_synthesis = KernelSynthesisConfig()
degradation = DegradationConfig()
geometry = PipelineGeometry(hr_size=400, crop_size=256, scale=4)
model = ModelConfig()
train_esrnet = TrainConfig()
train_esrgan = GanTrainConfig(resume="./results/RealESRNet_baseline/g_last")

# ---------------------------------------------------------------------------
# Reference-compatible module surface
# ---------------------------------------------------------------------------
in_channels = model.in_channels
out_channels = model.out_channels
upscale_factor = model.upscale_factor

# Current configuration method: "train_realesrnet" | "train_realesrgan" | "test"
mode = "train_realesrnet"
exp_name = "RealESRNet_baseline"

# NIQE pristine statistics (binary data mirrored from the reference's
# published model files, /root/reference/config.py:72)
niqe_model_path = "./assets/niqe_model.mat"

# Kernel-synthesis parameters (reference config.py:20-39)
degradation_model_parameters_dict = {
    "sinc_kernel_size": kernel_synthesis.pad_to,
    "gaussian_kernel_range": list(kernel_synthesis.kernel_sizes),
    "gaussian_kernel_type": ["isotropic", "anisotropic",
                             "generalized_isotropic", "generalized_anisotropic",
                             "plateau_isotropic", "plateau_anisotropic"],
    "gaussian_kernel_probability1": list(kernel_synthesis.kernel_type_probs1),
    "sinc_kernel_probability1": kernel_synthesis.sinc_prob1,
    "gaussian_sigma_range1": list(kernel_synthesis.sigma_range1),
    "generalized_kernel_beta_range1": list(kernel_synthesis.generalized_beta_range1),
    "plateau_kernel_beta_range1": list(kernel_synthesis.plateau_beta_range1),
    "gaussian_kernel_probability2": list(kernel_synthesis.kernel_type_probs2),
    "sinc_kernel_probability2": kernel_synthesis.sinc_prob2,
    "gaussian_sigma_range2": list(kernel_synthesis.sigma_range2),
    "generalized_kernel_beta_range2": list(kernel_synthesis.generalized_beta_range2),
    "plateau_kernel_beta_range2": list(kernel_synthesis.plateau_beta_range2),
    "sinc_kernel_probability3": kernel_synthesis.final_sinc_prob,
}

# Degradation-process parameters (reference config.py:41-62)
degradation_process_parameters_dict = {
    "first_blur_probability": degradation.first_blur_prob,
    "resize_probability1": list(degradation.resize_probs1),
    "resize_range1": list(degradation.resize_range1),
    "gray_noise_probability1": degradation.gray_noise_prob1,
    "gaussian_noise_probability1": degradation.gaussian_noise_prob1,
    "noise_range1": list(degradation.noise_range1),
    "poisson_scale_range1": list(degradation.poisson_scale_range1),
    "jpeg_range1": list(degradation.jpeg_range1),
    "second_blur_probability": degradation.second_blur_prob,
    "resize_probability2": list(degradation.resize_probs2),
    "resize_range2": list(degradation.resize_range2),
    "gray_noise_probability2": degradation.gray_noise_prob2,
    "gaussian_noise_probability2": degradation.gaussian_noise_prob2,
    "noise_range2": list(degradation.noise_range2),
    "poisson_scale_range2": list(degradation.poisson_scale_range2),
    "jpeg_range2": list(degradation.jpeg_range2),
}

if mode == "train_realesrnet":
    train_image_dir = train_esrnet.train_image_dir
    valid_image_dir = train_esrnet.valid_image_dir
    test_lr_image_dir = train_esrnet.test_lr_image_dir
    test_hr_image_dir = train_esrnet.test_hr_image_dir
    image_size = geometry.crop_size
    batch_size = train_esrnet.batch_size
    num_workers = train_esrnet.num_workers
    resume = train_esrnet.resume
    epochs = train_esrnet.epochs
    model_lr = train_esrnet.lr
    model_betas = train_esrnet.betas
    ema_model_weight_decay = train_esrnet.ema_decay
    lr_scheduler_step_size = train_esrnet.effective_lr_step_size
    lr_scheduler_gamma = train_esrnet.lr_gamma
    print_frequency = train_esrnet.print_frequency

if mode == "train_realesrgan":
    exp_name = train_esrgan.exp_name
    train_image_dir = train_esrgan.train_image_dir
    valid_image_dir = train_esrgan.valid_image_dir
    test_lr_image_dir = train_esrgan.test_lr_image_dir
    test_hr_image_dir = train_esrgan.test_hr_image_dir
    image_size = geometry.crop_size
    batch_size = train_esrgan.batch_size
    num_workers = train_esrgan.num_workers
    resume = train_esrgan.resume
    resume_d = train_esrgan.resume_d
    resume_g = train_esrgan.resume_g
    epochs = train_esrgan.epochs
    pixel_weight = train_esrgan.pixel_weight
    content_weight = list(train_esrgan.content_weights)
    adversarial_weight = train_esrgan.adversarial_weight
    model_lr = train_esrgan.lr
    model_betas = train_esrgan.betas
    ema_model_weight_decay = train_esrgan.ema_decay
    lr_scheduler_milestones = list(train_esrgan.effective_lr_milestones)
    lr_scheduler_gamma = train_esrgan.lr_gamma
    print_frequency = train_esrgan.print_frequency

if mode == "test":
    lr_dir = f"./data/Set5/LRbicx{upscale_factor}"
    sr_dir = f"./results/test/{exp_name}"
    hr_dir = "./data/Set5/GTmod12"
    model_path = "./results/pretrained_models/RealESRGAN_x4-DFO2K-678bf481.pth.tar"
