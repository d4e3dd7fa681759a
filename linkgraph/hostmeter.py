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
