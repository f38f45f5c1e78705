"""Host-RAM failsafe (utils/hostmem.py).

The failsafe converts the relay transfer leak's terminal state (a wedged
allocator at ~100% RAM) into a restartable crash taken right after a
checkpoint — the elastic restart loops in tools/run_inenv10_program.sh and
``--resume auto`` depend on its exact exit code and on it never misfiring
on a healthy process.
"""

import pytest

from real_esrgan_tpu.utils import hostmem


def test_fraction_is_sane_for_this_process():
    frac = hostmem.host_memory_fraction()
    # a running pytest process holds SOME resident memory, nowhere near all
    assert 0.0 < frac < 0.5


def test_check_passes_below_watermark():
    hostmem.check_host_memory(0.99)  # must not raise on a healthy process


def test_check_exits_restartable_above_watermark(monkeypatch, capsys):
    monkeypatch.setattr(hostmem, "host_memory_fraction", lambda: 0.93)
    with pytest.raises(SystemExit) as exc:
        hostmem.check_host_memory(0.8)
    assert exc.value.code == hostmem.RESTART_EXIT_CODE == 4
    assert "FAILSAFE" in capsys.readouterr().out


def test_fraction_degrades_to_zero_without_proc(monkeypatch):
    def raising_open(*a, **k):
        raise OSError("no /proc")

    monkeypatch.setattr("builtins.open", raising_open)
    assert hostmem.host_memory_fraction() == 0.0
