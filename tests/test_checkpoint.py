"""Checkpoint round-trip, best/last copies, filtered merge, and .pth.tar
ingestion through the converter."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import torch

from real_esrgan_tpu.train.checkpoint import (
    copy_checkpoint, load_checkpoint, load_generator_params, merge_matching,
    save_checkpoint,
)


def test_save_load_roundtrip(tmp_path):
    payload = {
        "epoch": 3,
        "best_niqe": 5.5,
        "step": np.int32(300),
        "params": {"conv1": {"kernel": np.ones((3, 3, 3, 8), np.float32),
                             "bias": np.zeros(8, np.float32)}},
        "ema_params": {"conv1": {"kernel": np.full((3, 3, 3, 8), 2.0, np.float32),
                                 "bias": np.ones(8, np.float32)}},
    }
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, payload)
    loaded = load_checkpoint(path)
    assert int(loaded["epoch"]) == 3
    np.testing.assert_allclose(loaded["params"]["conv1"]["kernel"], 1.0)
    np.testing.assert_allclose(loaded["ema_params"]["conv1"]["kernel"], 2.0)

    best = str(tmp_path / "best")
    copy_checkpoint(path, best)
    assert float(load_checkpoint(best)["best_niqe"]) == 5.5


def test_merge_matching_partial():
    params = {"a": {"kernel": np.zeros((2, 2))}, "b": {"bias": np.zeros(3)}}
    loaded = {"a": {"kernel": np.ones((2, 2))},
              "b": {"bias": np.ones(4)},     # shape mismatch -> kept original
              "c": {"junk": np.ones(1)}}     # extra key -> ignored
    merged = merge_matching(params, loaded)
    np.testing.assert_allclose(merged["a"]["kernel"], 1.0)
    np.testing.assert_allclose(merged["b"]["bias"], 0.0)
    assert "c" not in merged


def test_load_generator_params_from_pth_tar(tmp_path):
    """Reference-format .pth.tar with ema_state_dict + model. prefix."""
    sd = {"conv1.weight": torch.zeros(4, 3, 3, 3),
          "conv1.bias": torch.zeros(4)}
    ema = {f"model.{k}": v + 1 for k, v in sd.items()}
    path = str(tmp_path / "g.pth.tar")
    torch.save({"epoch": 1, "best_niqe": 9.9, "state_dict": sd,
                "ema_state_dict": ema, "optimizer": {}, "scheduler": {}}, path)

    params = load_generator_params(path, prefer_ema=True)
    np.testing.assert_allclose(params["conv1"]["kernel"], 1.0)  # ema chosen
    assert params["conv1"]["kernel"].shape == (3, 3, 3, 4)      # OIHW->HWIO

    params = load_generator_params(path, prefer_ema=False)
    np.testing.assert_allclose(params["conv1"]["kernel"], 0.0)
