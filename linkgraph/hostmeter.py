"""Host-noise evidence shared by bench.py and tools/scaling_bench.py.

One copy of the /proc/stat parsing so the steal numbers the two tools
record can never silently diverge.
"""

from __future__ import annotations


def cpu_jiffies() -> tuple[int, int] | None:
    """(steal, total) jiffies from the aggregate /proc/stat cpu line,
    or None when the read fails — callers must propagate the None
    rather than mixing a zero sample into a delta (a (0,0) fallback
    paired with one successful read would yield a since-boot average
    that misreports a heavily-stolen run as clean)."""
    try:
        with open("/proc/stat") as fh:
            vals = [int(v) for v in fh.readline().split()[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except (OSError, ValueError, IndexError):
        return None


def steal_pct(
    before: tuple[int, int] | None, after: tuple[int, int] | None
) -> float | None:
    """Steal share of machine time between two cpu_jiffies() samples;
    None when either sample is missing or no time elapsed."""
    if before is None or after is None:
        return None
    dt = after[1] - before[1]
    if dt <= 0:
        return None
    return round(100.0 * (after[0] - before[0]) / dt, 2)


_MEMBW_BUF = {}


def membw_gibs(size_log2: int = 23, repeats: int = 3) -> float | None:
    """Effective memory-copy bandwidth in GiB/s (best-of-N numpy copy of
    a 2^size_log2-element int64 array; first-touch pages included).
    Co-tenant memory-bandwidth exhaustion — the dominant noise source
    on this host (BENCH/scaling_run5_1v4_degraded_window.json: copies at
    0.19 GiB/s while steal stayed under 3.5% and every superstep ran
    2x slow) — is invisible to steal%% but lights up here. None when
    numpy is unavailable."""
    try:
        import time

        import numpy as np
    except ImportError:
        return None
    # the source buffer is generated once per process and reused:
    # allocation/first-touch itself runs at single-digit MiB/s in the
    # degraded windows this probe exists to detect (measured ~30 s for
    # 128 MiB), and the probe must stay cheap enough to run twice per
    # bench; 64 MiB keeps even the first call bounded
    a = _MEMBW_BUF.get(size_log2)
    if a is None:
        a = np.arange(1 << size_log2, dtype=np.int64)
        _MEMBW_BUF[size_log2] = a
    gib = (1 << size_log2) * 8 / (1 << 30)
    best = None
    for _ in range(max(1, repeats)):
        t0 = time.monotonic()
        a.copy()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return round(gib / best, 2)
