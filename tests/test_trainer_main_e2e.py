"""End-to-end trainer main() runs on the virtual 8-device CPU mesh.

Exercises the FULL driver path — maybe_initialize_distributed, mesh creation,
synthetic loader, fused jitted step sharded over 8 devices, every-step loss
meters, epoch checkpoint + best/last copies — with a tiny model/geometry.
(Reference has no such test; this is the multi-device smoke the VERDICT r1
review asked for.)
"""

import argparse
import os

import numpy as np
import pytest

pytestmark = pytest.mark.heavy

import config as run_config
from real_esrgan_tpu.configuration import (
    DegradationConfig, GanTrainConfig, ModelConfig, PipelineGeometry,
    TrainConfig,
)

TINY_GEO = PipelineGeometry(hr_size=64, crop_size=32, scale=4)
TINY_MODEL = ModelConfig(num_rrdb=1, channels=16, growth_channels=8)
TINY_DEG = DegradationConfig(usm_radius=13)


def _args(**overrides):
    base = dict(epochs=1, batch_size=8, resume="", synthetic=True,
                steps_per_epoch=2, no_tensorboard=True)
    base.update(overrides)
    return argparse.Namespace(**base)


def test_esrnet_main_end_to_end(tmp_path, monkeypatch):
    import train_realesrnet as trainer

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(run_config, "geometry", TINY_GEO)
    monkeypatch.setattr(run_config, "model", TINY_MODEL)
    monkeypatch.setattr(run_config, "degradation", TINY_DEG)
    monkeypatch.setattr(run_config, "train_esrnet",
                        TrainConfig(batch_size=8, print_frequency=1, epochs=1,
                                    num_workers=2))

    trainer.main(_args())

    last = os.path.join("results", run_config.exp_name, "g_last")
    assert os.path.exists(last), "epoch checkpoint g_last not written"
    from real_esrgan_tpu.train.checkpoint import load_checkpoint

    tree = load_checkpoint(last)
    assert int(np.asarray(tree["step"])) == 2
    assert int(tree["epoch"]) == 1

    # elastic restart: --resume auto must pick up the newest epoch
    # checkpoint and continue into epoch 2
    trainer.main(_args(epochs=2, resume="auto"))
    tree2 = load_checkpoint(last)
    assert int(tree2["epoch"]) == 2
    assert int(np.asarray(tree2["step"])) == 4


def test_esrnet_checkpoint_cadence(tmp_path, monkeypatch):
    """With checkpoint_frequency=2 over 3 epochs: epoch 1 is skipped, epochs
    2 (cadence) and 3 (final) save, and g_last is refreshed on EVERY saving
    epoch (reference train_realesrnet.py:124-129) — an interrupted run always
    leaves a loadable results/<exp>/g_last."""
    import train_realesrnet as trainer
    from real_esrgan_tpu.train import checkpoint as ckpt_lib

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(run_config, "geometry", TINY_GEO)
    monkeypatch.setattr(run_config, "model", TINY_MODEL)
    monkeypatch.setattr(run_config, "degradation", TINY_DEG)
    monkeypatch.setattr(run_config, "train_esrnet",
                        TrainConfig(batch_size=8, print_frequency=1, epochs=3,
                                    num_workers=2, checkpoint_frequency=2))

    last_copies = []
    real_copy = ckpt_lib.copy_checkpoint

    def spy(src, dst):
        if dst.endswith("g_last"):
            last_copies.append(os.path.basename(src))
        real_copy(src, dst)

    monkeypatch.setattr(ckpt_lib, "copy_checkpoint", spy)
    trainer.main(_args(epochs=3))

    samples = os.path.join("samples", run_config.exp_name)
    assert not os.path.exists(os.path.join(samples, "g_epoch_1"))
    assert os.path.exists(os.path.join(samples, "g_epoch_2"))
    assert last_copies == ["g_epoch_2", "g_epoch_3"]
    from real_esrgan_tpu.train.checkpoint import load_checkpoint

    tree = load_checkpoint(os.path.join("results", run_config.exp_name, "g_last"))
    assert int(tree["epoch"]) == 3


def test_esrnet_exp_name_override(tmp_path, monkeypatch):
    """--exp-name must route samples/ and results/ away from the config
    default so quality runs never clobber an existing baseline."""
    import train_realesrnet as trainer

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(run_config, "geometry", TINY_GEO)
    monkeypatch.setattr(run_config, "model", TINY_MODEL)
    monkeypatch.setattr(run_config, "degradation", TINY_DEG)
    monkeypatch.setattr(run_config, "train_esrnet",
                        TrainConfig(batch_size=8, print_frequency=1, epochs=1,
                                    num_workers=2))

    trainer.main(_args(exp_name="override_run"))

    assert os.path.exists(os.path.join("results", "override_run", "g_last"))
    assert not os.path.exists(os.path.join("results", run_config.exp_name))


def test_esrgan_main_end_to_end(tmp_path, monkeypatch):
    import train_realesrgan as trainer

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(run_config, "geometry", TINY_GEO)
    monkeypatch.setattr(run_config, "model", TINY_MODEL)
    monkeypatch.setattr(run_config, "degradation", TINY_DEG)
    cfg = GanTrainConfig(batch_size=8, print_frequency=1, epochs=1,
                         num_workers=2, exp_name="gan_e2e")
    monkeypatch.setattr(run_config, "train_esrgan", cfg)

    trainer.main(_args(resume_g="", resume_d=""))

    for name in ("g_last", "d_last"):
        assert os.path.exists(os.path.join("results", cfg.exp_name, name)), name


def test_esrnet_grain_loader_resume_continues_stream(tmp_path, monkeypatch,
                                                     capsys):
    """--loader grain + --resume auto: the stream position is persisted at
    saving epochs (samples/<exp>/loader_state_p0.bin, epoch-tagged) and
    restored on elastic restart, so the resumed run CONTINUES the
    deterministic global stream instead of replaying it from record 0."""
    import cv2

    import train_realesrnet as trainer
    from real_esrgan_tpu.data import grain_loader

    if not grain_loader.available():
        import pytest

        pytest.skip("grain not installed")

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(5)
    train_dir = tmp_path / "train"
    train_dir.mkdir()
    for i in range(16):
        cv2.imwrite(str(train_dir / f"im{i:02d}.png"),
                    (rng.random((64, 64, 3)) * 255).astype(np.uint8))
    aux = tmp_path / "aux"  # one image: datasets refuse empty dirs, and
    aux.mkdir()             # validate() is stubbed (NIQE needs >=96px SR)
    cv2.imwrite(str(aux / "v.png"),
                (rng.random((64, 64, 3)) * 255).astype(np.uint8))
    monkeypatch.setattr(trainer, "validate", lambda *a, **k: 100.0)

    monkeypatch.setattr(run_config, "geometry", TINY_GEO)
    monkeypatch.setattr(run_config, "model", TINY_MODEL)
    monkeypatch.setattr(run_config, "degradation", TINY_DEG)
    monkeypatch.setattr(run_config, "train_esrnet",
                        TrainConfig(batch_size=8, print_frequency=1, epochs=1,
                                    num_workers=0, loader="grain",
                                    train_image_dir=str(train_dir),
                                    valid_image_dir=str(aux),
                                    test_lr_image_dir=str(aux),
                                    test_hr_image_dir=str(aux)))

    trainer.main(_args(synthetic=False))
    state_file = os.path.join("samples", run_config.exp_name,
                              "loader_state_p0.bin")
    assert os.path.exists(state_file), "loader state not persisted"
    with open(state_file, "rb") as f:
        assert int.from_bytes(f.read(8), "little") == 1
    capsys.readouterr()

    trainer.main(_args(synthetic=False, epochs=2, resume="auto"))
    out = capsys.readouterr().out
    assert "Restored data-loader stream position." in out
    with open(state_file, "rb") as f:
        assert int.from_bytes(f.read(8), "little") == 2


def test_esrnet_missing_eval_dirs_skip(tmp_path, monkeypatch, capsys):
    """Missing valid/test eval dirs downgrade to a warning + skipped eval,
    not a crash (the reference hard-fails in os.listdir), and the
    --valid-dir/--test-lr-dir/--test-hr-dir CLI overrides reach the config."""
    import cv2

    import train_realesrnet as trainer

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(11)
    train_dir = tmp_path / "train"
    train_dir.mkdir()
    for i in range(8):
        cv2.imwrite(str(train_dir / f"im{i}.png"),
                    (rng.random((64, 64, 3)) * 255).astype(np.uint8))

    monkeypatch.setattr(run_config, "geometry", TINY_GEO)
    monkeypatch.setattr(run_config, "model", TINY_MODEL)
    monkeypatch.setattr(run_config, "degradation", TINY_DEG)
    monkeypatch.setattr(run_config, "train_esrnet",
                        TrainConfig(batch_size=8, print_frequency=1, epochs=1,
                                    num_workers=0,
                                    train_image_dir=str(train_dir)))

    trainer.main(_args(synthetic=False,
                       valid_dir=str(tmp_path / "no_valid"),
                       test_lr_dir=str(tmp_path / "no_lr"),
                       test_hr_dir=str(tmp_path / "no_hr")))
    out = capsys.readouterr().out
    assert "skipping the per-epoch valid NIQE eval" in out
    assert "skipping the per-epoch test NIQE eval" in out
    # with no eval signal, g_best must still exist (last = best guess) —
    # it is the GAN stage's default warm-start path
    for name in ("g_last", "g_best"):
        assert os.path.exists(os.path.join("results", run_config.exp_name,
                                           name)), name


def test_esrgan_trunk_content_backbone(tmp_path, monkeypatch, capsys):
    """--content-backbone trunk: the GAN stage trains with the frozen
    stage-1 trunk as the perceptual feature space (no VGG weights needed,
    no --allow-random-vgg)."""
    import train_realesrgan as trainer

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(run_config, "geometry", TINY_GEO)
    monkeypatch.setattr(run_config, "model", TINY_MODEL)
    monkeypatch.setattr(run_config, "degradation", TINY_DEG)
    cfg = GanTrainConfig(batch_size=8, print_frequency=1, epochs=1,
                         num_workers=2, exp_name="gan_trunk_e2e")
    monkeypatch.setattr(run_config, "train_esrgan", cfg)

    trainer.main(_args(resume_g="", resume_d="",
                       content_backbone="trunk"))
    out = capsys.readouterr().out
    assert "frozen stage-1 generator trunk" in out
    for name in ("g_last", "d_last"):
        assert os.path.exists(os.path.join("results", cfg.exp_name, name)), name


def test_esrgan_trunk_backbone_requires_warm_start(tmp_path, monkeypatch):
    """Without --synthetic and without a stage-1 warm start, the trunk
    backbone refuses: a random trunk is no better than random VGG."""
    import cv2
    import pytest

    import train_realesrgan as trainer

    monkeypatch.chdir(tmp_path)
    d = tmp_path / "imgs"
    d.mkdir()
    cv2.imwrite(str(d / "a.png"),
                (np.random.default_rng(0).random((64, 64, 3)) * 255)
                .astype(np.uint8))
    monkeypatch.setattr(run_config, "geometry", TINY_GEO)
    monkeypatch.setattr(run_config, "model", TINY_MODEL)
    monkeypatch.setattr(run_config, "degradation", TINY_DEG)
    cfg = GanTrainConfig(batch_size=8, print_frequency=1, epochs=1,
                         num_workers=0, exp_name="gan_trunk_guard",
                         resume="", train_image_dir=str(d),
                         valid_image_dir=str(d),
                         test_lr_image_dir=str(d), test_hr_image_dir=str(d))
    monkeypatch.setattr(run_config, "train_esrgan", cfg)

    with pytest.raises(SystemExit, match="warm start"):
        trainer.main(_args(synthetic=False, resume="", resume_g="",
                           resume_d="", content_backbone="trunk"))
