"""CLI end-to-end tests on the virtual CPU mesh: inference.py and test.py
main() run with a tiny generator and produce their documented outputs.
(Reference CLIs: /root/reference/inference.py, test.py.)
"""

import pytest

pytestmark = pytest.mark.heavy

import argparse
import os

import cv2
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TREE_LR = os.path.join(REPO, "tests", "data", "tree_lr.png")


def test_inference_main_whole_and_tiled(tmp_path, monkeypatch):
    import inference

    # tiny trunk: patch the builder so random-init main() stays fast
    orig = inference.build_generator
    monkeypatch.setattr(
        inference, "build_generator",
        lambda upscale_factor, num_rrdb=23, dtype=None: orig(
            upscale_factor, num_rrdb=1, dtype=dtype))

    out1 = str(tmp_path / "sr.png")
    args = argparse.Namespace(
        inputs_path=TREE_LR, output_path=out1, weights_path="none",
        upscale_factor=4, bfloat16=False, tile=0, tile_overlap=8,
        tile_batch=8, cpu=True)
    inference.main(args)
    img = cv2.imread(out1)
    assert img is not None and img.shape == (1024, 2048, 3)

    out2 = str(tmp_path / "sr_tiled.png")
    args.output_path, args.tile = out2, 64
    inference.main(args)
    tiled = cv2.imread(out2)
    assert tiled is not None and tiled.shape == (1024, 2048, 3)


def test_testpy_main_reports_niqe(tmp_path, monkeypatch):
    import functools

    import test as eval_cli
    from real_esrgan_tpu.serve import SRPipeline

    monkeypatch.setattr(eval_cli, "SRPipeline",
                        functools.partial(SRPipeline, num_rrdb=1))

    lr_dir = tmp_path / "lr"
    lr_dir.mkdir()
    src = cv2.imread(TREE_LR)
    cv2.imwrite(str(lr_dir / "a.png"), src[:96, :96])
    cv2.imwrite(str(lr_dir / "b.png"), src[:96, 96:192])

    args = argparse.Namespace(
        lr_dir=str(lr_dir), sr_dir=str(tmp_path / "sr"),
        hr_dir=str(lr_dir), model_path="", niqe_model_path=None,
        upscale_factor=4, bfloat16=False)
    from real_esrgan_tpu.metrics.niqe import DEFAULT_MODEL_PATH

    args.niqe_model_path = DEFAULT_MODEL_PATH
    avg = eval_cli.main(args)
    assert 0 < avg <= 100.0
    for name in ("a.png", "b.png"):
        out = cv2.imread(str(tmp_path / "sr" / name))
        assert out is not None and out.shape == (384, 384, 3)


def test_testpy_hr_dir_reports_psnr(tmp_path, monkeypatch, capsys):
    """--hr_dir is live: same-named correctly-shaped GTs yield a PSNR summary
    line, while the NIQE-only default final line is preserved (reference
    test.py:93-95 parity — the reference accepts --hr_dir but ignores it)."""
    import functools

    import test as eval_cli
    from real_esrgan_tpu.metrics.niqe import DEFAULT_MODEL_PATH
    from real_esrgan_tpu.serve import SRPipeline

    monkeypatch.setattr(eval_cli, "SRPipeline",
                        functools.partial(SRPipeline, num_rrdb=1))

    lr_dir, hr_dir = tmp_path / "lr", tmp_path / "hr"
    lr_dir.mkdir(); hr_dir.mkdir()
    src = cv2.imread(TREE_LR)
    lr = src[:96, :96]
    cv2.imwrite(str(lr_dir / "a.png"), lr)
    cv2.imwrite(str(hr_dir / "a.png"),
                cv2.resize(lr, (384, 384), interpolation=cv2.INTER_CUBIC))

    args = argparse.Namespace(
        lr_dir=str(lr_dir), sr_dir=str(tmp_path / "sr"), hr_dir=str(hr_dir),
        model_path="", niqe_model_path=DEFAULT_MODEL_PATH,
        upscale_factor=4, bfloat16=False)
    eval_cli.main(args)
    out = capsys.readouterr().out
    assert "NIQE:" in out  # reference-parity final line still present
    assert "PSNR:" in out and "(1 pairs)" in out
    psnr = float(out.split("PSNR:")[-1].split("dB")[0])
    assert 0 < psnr < 99.0
