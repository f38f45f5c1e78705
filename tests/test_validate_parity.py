"""End-to-end plumbing test for scripts/validate_parity.py.

Exercises the whole drop-in path with synthetic stand-ins: a tiny generator
exported to the reference's ``.pth.tar`` state_dict grammar
(/root/reference/model.py:206-252 key names), tiny LR images, the SR loop,
NIQE scoring, pixel-match, and the JSON verdict — so the harness is known
to work the moment the real published artifacts land (VERDICT r2 item 4).
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

import validate_parity  # noqa: E402


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    import jax
    import jax.numpy as jnp
    import torch

    from real_esrgan_tpu.models import Generator
    from real_esrgan_tpu.models.convert import export_generator
    from real_esrgan_tpu.utils.imgio import save_image_rgb

    root = tmp_path_factory.mktemp("parity")
    model = Generator(upscale_factor=4, num_rrdb=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    # reference-grammar checkpoint: the real .pth.tar ingest path
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in export_generator(params).items()}
    weights = root / "g_synthetic.pth.tar"
    torch.save({"state_dict": sd}, weights)

    lr_dir = root / "Set5_LR"
    lr_dir.mkdir()
    rng = np.random.default_rng(0)
    from PIL import Image

    for i in range(2):
        # 56px LR -> 224px SR: large enough for NIQE's 96px block grid
        img = (rng.random((56, 56, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(lr_dir / f"img{i}.png")
    _ = save_image_rgb  # imported to assert the io surface exists
    return {"weights": str(weights), "lr_dir": str(lr_dir), "root": root}


def test_niqe_table_and_verdict(artifacts, capsys):
    rc = validate_parity.main([
        "--weights", artifacts["weights"], "--model", "realesrnet",
        "--set5-lr", artifacts["lr_dir"], "--num-rrdb", "1", "--cpu",
        "--niqe-tol", "1000",  # random weights: plumbing test, not quality
        "--report", str(artifacts["root"] / "report.json"),
    ])
    out = capsys.readouterr().out
    assert rc == 0
    verdict = json.loads(out.strip().splitlines()[-1])
    assert verdict["parity"] is True
    assert verdict["checks"][0]["check"] == "niqe_set5"
    assert os.path.exists(artifacts["root"] / "report.json")


def test_fail_exit_code_when_out_of_tolerance(artifacts, capsys):
    rc = validate_parity.main([
        "--weights", artifacts["weights"], "--model", "realesrgan",
        "--set5-lr", artifacts["lr_dir"], "--num-rrdb", "1", "--cpu",
        "--niqe-tol", "-100",  # impossible bar -> must FAIL with exit 1
    ])
    out = capsys.readouterr().out
    assert rc == 1
    assert json.loads(out.strip().splitlines()[-1])["parity"] is False


def test_pixel_match_against_own_outputs(artifacts, capsys):
    """Self-consistency: our SR outputs pixel-match themselves (PASS), and
    the check wires through the verdict."""
    sr_dir = artifacts["root"] / "own_sr"
    rc = validate_parity.main([
        "--weights", artifacts["weights"], "--set5-lr", artifacts["lr_dir"],
        "--num-rrdb", "1", "--cpu", "--niqe-tol", "1000",
        "--sr-out-dir", str(sr_dir)])
    assert rc == 0
    rc = validate_parity.main([
        "--weights", artifacts["weights"], "--set5-lr", artifacts["lr_dir"],
        "--num-rrdb", "1", "--cpu", "--niqe-tol", "1000",
        "--reference-sr-dir", str(sr_dir / "Set5")])
    out = capsys.readouterr().out
    assert rc == 0
    verdict = json.loads(out.strip().splitlines()[-1])
    pm = [c for c in verdict["checks"] if c["check"] == "pixel_match_psnr"]
    assert pm and pm[0]["ok"]
