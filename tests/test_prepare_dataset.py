"""Dataset-prep tooling: sliding-window cropper (reference scripts/
prepare_dataset.py counterpart)."""

import argparse
import os

import cv2
import numpy as np

from scripts.prepare_dataset import main as prepare_main, worker


def test_worker_sliding_window(tmp_path):
    img = (np.random.default_rng(0).random((100, 140, 3)) * 255).astype(np.uint8)
    src = str(tmp_path / "img.png")
    cv2.imwrite(src, img)
    out_dir = tmp_path / "out"
    out_dir.mkdir()

    n = worker((src, str(out_dir), 40, 30, 0))
    # tops: 0,30,60 (3); lefts: 0,30,60,90 (4) -> 12 patches
    assert n == 12
    files = sorted(os.listdir(out_dir))
    assert len(files) == 12
    patch = cv2.imread(str(out_dir / files[0]))
    assert patch.shape == (40, 40, 3)
    np.testing.assert_array_equal(patch, img[:40, :40])


def test_main_end_to_end(tmp_path):
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(3):
        cv2.imwrite(str(src_dir / f"i{i}.png"),
                    (rng.random((64, 64, 3)) * 255).astype(np.uint8))
    out_dir = str(tmp_path / "patches")
    prepare_main(argparse.Namespace(images_dir=str(src_dir),
                                    output_dir=out_dir, image_size=32,
                                    step=32, thresh_size=0, num_workers=2))
    assert len(os.listdir(out_dir)) == 3 * 4  # 2x2 grid per image
