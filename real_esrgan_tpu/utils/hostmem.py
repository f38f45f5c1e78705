"""Host-RAM failure detection for long training runs.

The axon-relayed TPU leaks host RAM on every host->device transfer (measured
and mitigated by the device-resident pool, data/device_pool.py), and round
5's stage-1 run demonstrated the failure mode: 128 GB RSS by epoch 300, then
the process wedged allocating inside the epoch-300 checkpoint — alive,
silent, zero progress, un-resumable until killed.  A crashed process is
recoverable (elastic ``--resume auto`` + the program script's restart loop);
a wedged one is not.  So the trainers convert the wedge into a crash: after
each checkpoint they call :func:`check_host_memory`, and past the watermark
the run exits rc=4 — the restart loop resumes it in a fresh, leak-free
process with nothing lost.
"""

from __future__ import annotations

import os

RESTART_EXIT_CODE = 4


def host_memory_fraction() -> float:
    """This process's RSS as a fraction of the machine's total RAM.

    Returns 0.0 where /proc is unavailable — the failsafe silently
    deactivates rather than misfiring.
    """
    try:
        rss_kb = total_kb = 0
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    rss_kb = int(line.split()[1])
                    break
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal"):
                    total_kb = int(line.split()[1])
                    break
        return rss_kb / total_kb if total_kb else 0.0
    except OSError:
        return 0.0


def check_host_memory(watermark: float = 0.8) -> None:
    """Exit rc=4 (restartable) when host RSS crosses ``watermark``.

    Call ONLY at points where all state is durable (right after a
    checkpoint): the exit is abrupt by design, before the leak wedges the
    allocator and makes even checkpointing impossible.
    """
    frac = host_memory_fraction()
    if frac >= watermark:
        print(f"HOST-MEMORY FAILSAFE: RSS at {100 * frac:.0f}% of system RAM "
              f"(watermark {100 * watermark:.0f}%). State is checkpointed; "
              f"exiting rc={RESTART_EXIT_CODE} for a fresh-process resume "
              "before the leak wedges the machine.", flush=True)
        raise SystemExit(RESTART_EXIT_CODE)
