"""The reference-compatible config module surface must expose the documented
names in every mode (users flip `mode` and edit constants, README.md:39)."""

import importlib
import sys


def _load_config_with_mode(mode):
    import config as cfg_mod
    src = open(cfg_mod.__file__).read()
    src = src.replace('mode = "train_realesrnet"', f'mode = "{mode}"')
    namespace = {"__file__": cfg_mod.__file__, "__name__": "config_test"}
    exec(compile(src, cfg_mod.__file__, "exec"), namespace)
    return namespace


def test_esrnet_mode_surface():
    ns = _load_config_with_mode("train_realesrnet")
    for name in ("upscale_factor", "exp_name", "degradation_model_parameters_dict",
                 "degradation_process_parameters_dict", "train_image_dir",
                 "image_size", "batch_size", "epochs", "model_lr", "model_betas",
                 "ema_model_weight_decay", "lr_scheduler_step_size",
                 "lr_scheduler_gamma", "print_frequency", "niqe_model_path"):
        assert name in ns, name
    assert ns["lr_scheduler_step_size"] == ns["epochs"] // 5


def test_esrgan_mode_surface():
    ns = _load_config_with_mode("train_realesrgan")
    for name in ("resume", "resume_d", "resume_g", "pixel_weight",
                 "content_weight", "adversarial_weight",
                 "lr_scheduler_milestones"):
        assert name in ns, name
    assert len(ns["content_weight"]) == 5
    assert ns["lr_scheduler_milestones"] == [
        int(ns["epochs"] * f) for f in (0.125, 0.25, 0.5, 0.75)]


def test_test_mode_surface():
    ns = _load_config_with_mode("test")
    for name in ("lr_dir", "sr_dir", "hr_dir", "model_path"):
        assert name in ns, name


def test_parameter_dicts_match_reference_values():
    import config as ns
    d = ns.degradation_model_parameters_dict
    assert d["gaussian_kernel_range"] == [7, 9, 11, 13, 15, 17, 19, 21]
    assert d["gaussian_kernel_probability1"] == [0.45, 0.25, 0.12, 0.03, 0.12, 0.03]
    assert d["sinc_kernel_probability3"] == 0.8
    p = ns.degradation_process_parameters_dict
    assert p["resize_range1"] == [0.15, 1.5]
    assert p["jpeg_range1"] == [30.0, 95.0]
    assert p["second_blur_probability"] == 0.8
