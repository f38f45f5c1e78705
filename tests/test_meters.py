"""Console meter math + formatting (reference AverageMeter/ProgressMeter UX,
/root/reference/train_realesrnet.py:497-561)."""

from real_esrgan_tpu.utils.meters import AverageMeter, ProgressMeter, Summary


def test_average_meter_weighted_updates():
    m = AverageMeter("Loss", ":6.4f")
    m.update(1.0, n=2)
    m.update(4.0, n=1)
    assert m.count == 3
    assert abs(m.avg - 2.0) < 1e-9
    assert m.val == 4.0
    assert "Loss" in str(m) and "4.0000" in str(m)
    m.reset()
    assert m.count == 0 and m.avg == 0.0


def test_summary_types():
    for st, expect in ((Summary.AVERAGE, "X 2.00"), (Summary.SUM, "X 6.00"),
                       (Summary.COUNT, "X 3.00"), (Summary.NONE, "")):
        m = AverageMeter("X", summary_type=st)
        m.update(2.0, n=3)
        assert m.summary() == expect, (st, m.summary())


def test_progress_meter_display(capsys):
    m = AverageMeter("Loss", ":4.2f")
    m.update(0.5)
    p = ProgressMeter(120, [m], prefix="Epoch: [3]")
    p.display(7)
    out = capsys.readouterr().out
    assert "Epoch: [3][  7/120]" in out and "0.50" in out
    p.display_summary()
    assert "Loss 0.50" in capsys.readouterr().out
