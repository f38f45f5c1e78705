"""Console meter math + formatting (keeps the reference trainers' console UX;
this framework's own dataclass/format-spec design)."""

from real_esrgan_tpu.utils.meters import AverageMeter, ProgressMeter


def test_average_meter_weighted_updates():
    m = AverageMeter("Loss", "6.4f")
    m.update(1.0, n=2)
    m.update(4.0, n=1)
    assert m.count == 3
    assert abs(m.avg - 2.0) < 1e-9
    assert m.val == 4.0
    assert "Loss" in str(m) and "4.0000" in str(m)
    m.reset()
    assert m.count == 0 and m.avg == 0.0


def test_torch_style_spec_tolerated():
    m = AverageMeter("Loss", ":6.3f")
    m.update(0.125)
    assert " 0.125" in str(m)


def test_summary_modes():
    for mode, expect in (("avg", "X 2.00"), ("sum", "X 6.00"),
                         ("count", "X 3.00"), ("none", "")):
        m = AverageMeter("X", summary_mode=mode)
        m.update(2.0, n=3)
        assert m.summary() == expect, (mode, m.summary())


def test_progress_meter_display(capsys):
    m = AverageMeter("Loss", "4.2f")
    m.update(0.5)
    p = ProgressMeter(120, [m], prefix="Epoch: [3]")
    p.display(7)
    out = capsys.readouterr().out
    assert "Epoch: [3][  7/120]" in out and "0.50" in out
    p.display_summary()
    assert "Loss 0.50" in capsys.readouterr().out
