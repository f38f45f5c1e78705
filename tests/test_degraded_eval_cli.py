"""End-to-end test for the degraded-eval tooling: make_degraded_eval.py
produces aligned in-distribution (LR, HR) pairs and eval_pair.py scores
them — including the ``--bicubic`` no-model baseline.

(The reference has no such tool; its blind-SR eval is NIQE-only because
real degraded inputs lack ground truth — README.md's NIQE table.)
"""

import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


@pytest.fixture(scope="module")
def pair_dirs(tmp_path_factory):
    from real_esrgan_tpu.utils.imgio import save_image_rgb

    import make_degraded_eval

    root = tmp_path_factory.mktemp("degraded")
    gt_dir = root / "gt"
    gt_dir.mkdir()
    rng = np.random.default_rng(0)
    # one image yielding 2x2 tiles, one yielding a single tile
    save_image_rgb(str(gt_dir / "big.png"),
                   rng.uniform(size=(128, 128, 3)).astype(np.float32))
    save_image_rgb(str(gt_dir / "small.png"),
                   rng.uniform(size=(70, 64, 3)).astype(np.float32))
    out = root / "pairs"
    make_degraded_eval.main([
        "--gt-dir", str(gt_dir), "--output-dir", str(out),
        "--seed", "3", "--hr-size", "64", "--crop-size", "32",
        "--batch-size", "4", "--cpu"])
    return out


def test_make_degraded_eval_writes_aligned_pairs(pair_dirs):
    import cv2

    lr_names = sorted(os.listdir(pair_dirs / "LRx4"))
    hr_names = sorted(os.listdir(pair_dirs / "GTmod4"))
    assert lr_names == hr_names and len(lr_names) == 5   # 2x2 grid + 1
    lr = cv2.imread(str(pair_dirs / "LRx4" / lr_names[0]))
    hr = cv2.imread(str(pair_dirs / "GTmod4" / lr_names[0]))
    assert lr.shape == (8, 8, 3) and hr.shape == (32, 32, 3)
    # degradation must actually have happened: LR differs from a clean
    # bicubic downscale of HR (blur/noise/JPEG applied)
    clean = cv2.resize(hr, (8, 8), interpolation=cv2.INTER_AREA)
    assert np.abs(lr.astype(int) - clean.astype(int)).max() > 2


def test_eval_pair_bicubic_baseline(pair_dirs, capsys):
    import eval_pair

    eval_pair.main(["--bicubic", "--lr-dir", str(pair_dirs / "LRx4"),
                    "--hr-dir", str(pair_dirs / "GTmod4"), "--cpu"])
    last = capsys.readouterr().out.strip().splitlines()[-1]
    report = json.loads(last)
    assert report["which"] == "bicubic" and report["n"] == 5
    assert 5.0 < report["psnr_mean"] < 40.0


def test_eval_pair_requires_weights_without_bicubic(pair_dirs):
    import eval_pair

    with pytest.raises(SystemExit):
        eval_pair.main(["--lr-dir", str(pair_dirs / "LRx4"),
                        "--hr-dir", str(pair_dirs / "GTmod4"), "--cpu"])
