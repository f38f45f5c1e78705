"""tools/make_inenv_dataset.py e2e: spatial train/eval holdout per source,
including the --textures path (sources monkeypatched to synthetic images so
CI does not depend on site-packages assets).
"""

import os
import sys

import cv2
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_textures_holdout_and_train_crops(tmp_path, monkeypatch):
    from tools import make_inenv_dataset as mk

    rng = np.random.default_rng(0)

    def synth(path, h, w):
        cv2.imwrite(str(path), rng.integers(0, 255, (h, w, 3), np.uint8))
        return str(path)

    tree = synth(tmp_path / "tree.png", 1024, 2048)
    hopper = synth(tmp_path / "hopper.png", 600, 512)
    # one splittable texture (256 eval strip + >=crop rows) and one too
    # small to split (train-only), plus a missing path (skipped gracefully)
    big_tex = synth(tmp_path / "tex_big.png", 700, 512)
    small_tex = synth(tmp_path / "tex_small.png", 512, 512)
    monkeypatch.setattr(mk, "TEXTURE_SRCS", [
        ("bigtex", big_tex),
        ("smalltex", small_tex),
        ("missing", str(tmp_path / "nope.png")),
    ])

    out = tmp_path / "ds"
    mk.main(["--out", str(out), "--tree", tree, "--hopper", hopper,
             "--textures", "--texture-step", "112",
             "--tree-step", "512", "--hopper-repeat", "1"])

    train = sorted(os.listdir(out / "train"))
    eval_src = sorted(os.listdir(out / "eval_src"))
    # splittable texture got a held-out strip; the small one trains only
    assert "bigtex_heldout.png" in eval_src
    assert "smalltex_heldout.png" not in eval_src
    assert any(n.startswith("bigtex_") for n in train)
    assert any(n.startswith("smalltex_") for n in train)
    assert not any(n.startswith("missing") for n in train)

    held = cv2.imread(str(out / "eval_src" / "bigtex_heldout.png"))
    assert held.shape == (256, 512, 3)
    src = cv2.imread(big_tex)
    assert np.array_equal(held, src[:256])
    # every bigtex train crop comes from BELOW the held-out strip
    first_crop = cv2.imread(
        str(out / "train" / next(n for n in train if n.startswith("bigtex"))))
    assert first_crop.shape == (400, 400, 3)
    assert np.array_equal(first_crop, src[256:656, 0:400])

    # eval pairs produced for every held-out region
    pairs = sorted(os.listdir(out / "eval" / "GTmod4"))
    assert pairs == sorted(os.listdir(out / "eval" / "LRbicx4"))
    assert "bigtex_heldout.png" in pairs and "tree_heldout.png" in pairs
