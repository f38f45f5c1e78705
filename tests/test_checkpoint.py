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


def test_npz_snapshot_roundtrip_and_cli(tmp_path):
    """save_params_npz <-> load_generator_params round trip (f16 within
    tolerance), including the snapshot_weights CLI from an Orbax dir."""
    from real_esrgan_tpu.train.checkpoint import save_params_npz

    rng = np.random.default_rng(3)
    params = {"conv1": {"kernel": rng.normal(size=(3, 3, 3, 8))
                        .astype(np.float32),
                        "bias": rng.normal(size=8).astype(np.float32)},
              "trunk": {"rdb0": {"kernel": rng.normal(size=(1, 1, 8, 8))
                                 .astype(np.float32)}}}
    npz = str(tmp_path / "w.npz")
    save_params_npz(npz, params)
    loaded = load_generator_params(npz)
    assert loaded["conv1"]["kernel"].dtype == np.float32  # f16 upcast on load
    for got, want in zip(jax.tree_util.tree_leaves(loaded),
                         jax.tree_util.tree_leaves(params)):
        np.testing.assert_allclose(got, want, atol=1e-3)

    # CLI: Orbax checkpoint -> npz (EMA preferred), loadable the same way
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, {"params": params,
                           "ema_params": jax.tree.map(lambda x: x + 1.0,
                                                      params)})
    import argparse
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    import snapshot_weights

    out = str(tmp_path / "ema.npz")
    snapshot_weights.main(argparse.Namespace(
        checkpoint=ckpt, output=out, use_params=False, float32=False))
    ema = load_generator_params(out)
    np.testing.assert_allclose(ema["conv1"]["bias"],
                               params["conv1"]["bias"] + 1.0, atol=1e-2)


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


def test_restore_like_rebuilds_optax_state(tmp_path):
    """Orbax round-trips optax states as lists-of-dicts; restore_like must
    rebuild the original NamedTuple structure (regression: resume crashed)."""
    import optax
    from real_esrgan_tpu.train.checkpoint import restore_like, save_checkpoint

    tx = optax.adam(1e-3, b1=0.9, b2=0.99)
    params = {"w": np.ones((4, 4), np.float32)}
    opt_state = tx.init(params)
    path = str(tmp_path / "opt")
    save_checkpoint(path, {"opt_state": jax.device_get(opt_state)})
    raw = load_checkpoint(path)["opt_state"]

    rebuilt = restore_like(jax.device_get(opt_state), raw)
    # must be usable by optax straight away
    grads = {"w": np.full((4, 4), 0.1, np.float32)}
    updates, _ = tx.update(jax.tree_util.tree_map(jnp.asarray, grads),
                           rebuilt, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_restore_like_mismatch_semantics():
    import pytest

    from real_esrgan_tpu.train.checkpoint import restore_like

    template = {"a": np.zeros(3), "b": np.zeros(2)}
    # raises by default: silently training from fresh state while claiming to
    # have resumed would be worse
    with pytest.raises(ValueError):
        restore_like(template, {"a": np.ones(3)})
    with pytest.raises(ValueError):
        restore_like(template, {"a": np.ones(3), "b": np.ones(5)})
    # explicit opt-in fallback (used for optimizer states, safe to reinit)
    assert restore_like(template, {"a": np.ones(3)},
                        on_mismatch="template") is template


def test_find_latest_checkpoint(tmp_path):
    from real_esrgan_tpu.train.checkpoint import find_latest_checkpoint

    assert find_latest_checkpoint(str(tmp_path / "missing")) == ""
    for n in (1, 3, 12):
        (tmp_path / f"g_epoch_{n}").mkdir()
    (tmp_path / "g_epoch_bogus").mkdir()
    (tmp_path / "d_epoch_20").mkdir()
    assert find_latest_checkpoint(str(tmp_path)).endswith("g_epoch_12")
    assert find_latest_checkpoint(str(tmp_path), "d_epoch_").endswith("d_epoch_20")


def test_export_torch_cli(tmp_path):
    """Orbax checkpoint -> reference .pth.tar -> framework re-ingest."""
    import argparse

    import jax
    import jax.numpy as jnp

    from real_esrgan_tpu.models import Generator
    from real_esrgan_tpu.train.checkpoint import (
        load_generator_params, save_checkpoint,
    )
    from scripts.export_torch import main as export_main

    model = Generator(num_rrdb=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))["params"]
    ckpt = str(tmp_path / "g_best")
    save_checkpoint(ckpt, {"epoch": 5, "best_niqe": 8.5, "params": params,
                           "ema_params": params, "opt_state": {}})

    out = str(tmp_path / "g_best.pth.tar")
    export_main(argparse.Namespace(checkpoint=ckpt, output=out))

    import torch

    payload = torch.load(out, weights_only=False)
    assert payload["epoch"] == 5
    assert any(k.startswith("model.") for k in payload["ema_state_dict"])

    back = load_generator_params(out)  # prefers ema, strips model. prefix
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(params), back)


def test_async_saver_roundtrip_and_donation_safety(tmp_path):
    """AsyncSaver must snapshot device buffers BEFORE returning: the jitted
    train step donates the state, so by the time the background thread runs
    the original arrays are deleted."""
    from real_esrgan_tpu.train.checkpoint import (
        AsyncSaver, copy_checkpoint, load_checkpoint,
    )

    x = jnp.arange(8.0)
    payload = {"epoch": 3, "params": {"w": x}}
    saver = AsyncSaver()
    saver.save(str(tmp_path / "ck"), payload,
               copies=[str(tmp_path / "last")])
    x.delete()  # simulate donation consuming the buffer
    saver.wait()

    for name in ("ck", "last"):
        tree = load_checkpoint(str(tmp_path / name))
        np.testing.assert_array_equal(tree["params"]["w"], np.arange(8.0))
        assert int(tree["epoch"]) == 3


def test_async_saver_ordering_and_error_propagation(tmp_path):
    from real_esrgan_tpu.train.checkpoint import AsyncSaver, load_checkpoint

    saver = AsyncSaver()
    for i in range(3):  # each save joins the previous: last write wins
        saver.save(str(tmp_path / "ck"), {"epoch": i})
    saver.wait()
    assert int(load_checkpoint(str(tmp_path / "ck"))["epoch"]) == 2

    saver.save("/proc/definitely/not/writable", {"epoch": 0})
    try:
        saver.wait()
        raise AssertionError("expected RuntimeError from failed async save")
    except RuntimeError:
        pass
    saver.wait()  # error is consumed; saver remains usable


def test_copy_checkpoint_swap_is_crash_safe(tmp_path):
    """copy_checkpoint must never leave dst missing/partial: it builds a
    .tmp sibling and swaps via renames, clearing stale .tmp/.old leftovers
    from a previous crash."""
    from real_esrgan_tpu.train.checkpoint import copy_checkpoint

    src = tmp_path / "g_epoch_2"
    src.mkdir()
    (src / "data").write_text("new")
    dst = tmp_path / "g_last"
    dst.mkdir()
    (dst / "data").write_text("old")
    # stale leftovers from a crash mid-swap
    (tmp_path / "g_last.tmp").mkdir()
    (tmp_path / "g_last.tmp" / "data").write_text("junk")
    (tmp_path / "g_last.old").mkdir()

    copy_checkpoint(str(src), str(dst))

    assert (dst / "data").read_text() == "new"
    assert not (tmp_path / "g_last.tmp").exists()
    assert not (tmp_path / "g_last.old").exists()
    # fresh dst (no previous copy) also works
    copy_checkpoint(str(src), str(tmp_path / "g_best"))
    assert (tmp_path / "g_best" / "data").read_text() == "new"
