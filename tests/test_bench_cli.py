"""bench.py driver contract: all-mode output shape, ordering, skip logic.

The driver records the LAST JSON line of `python bench.py` — these tests pin
that the flagship inference line is last, carries the other metrics as extra
keys, states baseline provenance, and that budget-exceeded or failing stages
are skipped with a comment rather than breaking the run (measure functions
are stubbed; the real measurements run on hardware via bench.py itself).
"""

import json

import pytest

import bench


@pytest.fixture(autouse=True)
def private_lock(monkeypatch, tmp_path):
    # never wait on the REAL chip lock: a live training run holding
    # /tmp/tpu_busy.lock would stall this CPU-only contract test 30 min
    monkeypatch.setattr(bench, "TPU_BUSY_LOCK", str(tmp_path / "busy.lock"))


@pytest.fixture
def stubbed(monkeypatch):
    monkeypatch.setattr(bench, "measure", lambda b, s, i: 20.0)
    monkeypatch.setattr(bench, "measure_train", lambda b, i, mix=True: 95.0)
    monkeypatch.setattr(bench, "measure_gan", lambda b, i, mix=True: 58.0)
    monkeypatch.setattr(bench, "measure_tiled", lambda i: 12.0)


def _run(monkeypatch, capsys, argv):
    monkeypatch.setattr("sys.argv", ["bench.py", *argv])
    bench.main()
    return capsys.readouterr().out.strip().splitlines()


def test_all_mode_flagship_last_with_extras(stubbed, monkeypatch, capsys):
    lines = _run(monkeypatch, capsys, [])
    parsed = [json.loads(l) for l in lines if l.startswith("{")]
    assert len(parsed) == 4
    last = parsed[-1]
    assert last["metric"] == "x4_sr_output_megapixels_per_sec_per_chip"
    assert last["train_imgs_per_s"] == 95.0
    assert last["gan_imgs_per_s"] == 58.0
    assert last["tiled_mp_per_s"] == 12.0
    for line in parsed:
        assert "baseline_note" in line and "estimate" in line["baseline_note"]
        assert set(line) >= {"metric", "value", "unit", "vs_baseline"}


def test_all_mode_budget_skips_heavy_stages(stubbed, monkeypatch, capsys):
    monkeypatch.setattr(bench.time, "perf_counter",
                        iter([0.0, 1e6, 2e6, 3e6, 4e6]).__next__)
    lines = _run(monkeypatch, capsys, ["--budget", "10"])
    parsed = [json.loads(l) for l in lines if l.startswith("{")]
    assert len(parsed) == 1  # only the flagship line
    assert parsed[0]["metric"] == "x4_sr_output_megapixels_per_sec_per_chip"
    assert any(l.startswith("# skipped") for l in lines)


def test_all_mode_survives_stage_failure(stubbed, monkeypatch, capsys):
    def boom(b, i, mix=True):
        raise RuntimeError("stage exploded")

    monkeypatch.setattr(bench, "measure_gan", boom)
    lines = _run(monkeypatch, capsys, [])
    parsed = [json.loads(l) for l in lines if l.startswith("{")]
    assert len(parsed) == 3
    assert parsed[-1]["metric"] == "x4_sr_output_megapixels_per_sec_per_chip"
    assert "gan_imgs_per_s" not in parsed[-1]
    assert any(l.startswith("# gan stage failed") for l in lines)


def test_single_mode_one_line(stubbed, monkeypatch, capsys):
    lines = _run(monkeypatch, capsys, ["--mode", "train"])
    parsed = [json.loads(l) for l in lines if l.startswith("{")]
    assert len(parsed) == 1
    assert parsed[0]["metric"] == "x4_train_images_per_sec_per_chip"


def test_lines_carry_ceiling_keys_when_flops_recorded(
        stubbed, monkeypatch, capsys):
    """When counted FLOPs are available, every line carries effective_tflops
    and (with a known chip) peak_fraction — the driver-legible ceiling case
    (VERDICT r3 next-step #3)."""
    monkeypatch.setattr(bench, "_chip_peak_tflops", lambda: 197.0)
    monkeypatch.setitem(bench._FLOPS_PER_UNIT, "inference", 2.24e12)
    lines = _run(monkeypatch, capsys, ["--mode", "inference"])
    line = json.loads(lines[-1])
    assert line["effective_tflops"] == round(20.0 * 2.24, 2)
    assert line["peak_fraction"] == round(20.0 * 2.24 / 197.0, 4)
    assert line["chip_peak_tflops"] == 197.0


def test_record_flops_from_compiled_hlo():
    """_record_flops measures the compiled program's counted FLOPs (here a
    known 8x8x8 matmul: 2*8^3 = 1024 flops per unit)."""
    import jax
    import jax.numpy as jnp

    bench._FLOPS_PER_UNIT.pop("inference", None)
    a = jnp.ones((8, 8), jnp.float32)
    bench._record_flops("inference", jax.jit(lambda x, y: x @ y), 1.0, a, a)
    try:
        assert bench._FLOPS_PER_UNIT["inference"] == 1024.0
    finally:
        bench._FLOPS_PER_UNIT.pop("inference", None)
