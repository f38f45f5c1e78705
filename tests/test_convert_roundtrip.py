"""Full-depth weight-conversion round trip on a real image.

The strongest conversion proof this environment allows (no published weights
in-env, see docs/PARITY.md): initialize the FULL 23-RRDB generator, export it
as a ``.pth.tar`` with the reference's exact payload grammar
(/root/reference/train_realesrnet.py:117-123: ``{epoch, best_niqe,
state_dict, ema_state_dict (model.-prefixed), optimizer, scheduler}``),
torch.save/torch.load it, re-ingest through the framework's loader (EMA
preference + prefix strip, /root/reference/inference.py:33), and assert the
JAX forward matches an independent torch functional op-graph at full depth on
a crop of figure/tree_lr.png.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import torch

from real_esrgan_tpu.models import Generator
from real_esrgan_tpu.models.convert import export_generator
from real_esrgan_tpu.train.checkpoint import load_generator_params
from real_esrgan_tpu.utils.imgio import load_image_rgb

from tests.test_models import _torch_generator_forward

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TREE_LR = os.path.join(REPO, "figure", "tree_lr.png")

NUM_RRDB = 23


def test_full_depth_pth_tar_roundtrip(tmp_path):
    model = Generator(upscale_factor=4, num_rrdb=NUM_RRDB)
    params = model.init(jax.random.PRNGKey(11),
                        jnp.zeros((1, 16, 16, 3)))["params"]

    # ---- export with the reference's exact checkpoint payload ----
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in export_generator(jax.device_get(params)).items()}
    payload = {
        "epoch": 3,
        "best_niqe": 9.9,
        "state_dict": {k: torch.zeros_like(v) for k, v in sd.items()},  # decoy
        "ema_state_dict": {f"model.{k}": v for k, v in sd.items()},
        "optimizer": {"state": {}, "param_groups": []},
        "scheduler": {"last_epoch": 3},
    }
    path = str(tmp_path / "g_best.pth.tar")
    torch.save(payload, path)

    # ---- re-ingest: must pick ema_state_dict and strip the model. prefix ----
    loaded = load_generator_params(path, prefer_ema=True)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(params), loaded)

    # ---- full-depth forward parity on a real image crop ----
    img = load_image_rgb(TREE_LR)[:48, :48]  # crop bounds CPU test time
    x_nchw = torch.from_numpy(img.transpose(2, 0, 1)[None])
    with torch.no_grad():
        expected = _torch_generator_forward(sd, x_nchw,
                                            num_rrdb=NUM_RRDB).numpy()

    out = model.apply({"params": loaded}, jnp.asarray(img[None]))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert out.shape == expected.shape == (1, 3, 192, 192)
    np.testing.assert_allclose(out, expected, atol=5e-5)
