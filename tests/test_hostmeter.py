"""linkgraph.hostmeter: the shared /proc/stat sampling used by bench.py
and tools/scaling_bench.py for noisy-neighbor evidence."""

from linkgraph import hostmeter


def test_cpu_jiffies_shape():
    j = hostmeter.cpu_jiffies()
    # this test host has /proc/stat; on one that doesn't, None is legal
    if j is not None:
        steal, total = j
        assert 0 <= steal <= total


def test_steal_pct_arithmetic():
    assert hostmeter.steal_pct((100, 1000), (150, 2000)) == 5.0
    assert hostmeter.steal_pct((0, 1000), (0, 2000)) == 0.0


def test_steal_pct_none_propagation():
    # a failed sample must yield None, never a since-boot average
    assert hostmeter.steal_pct(None, (150, 2000)) is None
    assert hostmeter.steal_pct((100, 1000), None) is None
    assert hostmeter.steal_pct(None, None) is None
    # zero or negative elapsed time is unmeasurable, not 0%
    assert hostmeter.steal_pct((100, 1000), (100, 1000)) is None


def test_monotonic_between_samples():
    a = hostmeter.cpu_jiffies()
    b = hostmeter.cpu_jiffies()
    if a is not None and b is not None:
        assert b[1] >= a[1]
        p = hostmeter.steal_pct(a, b)
        assert p is None or 0.0 <= p <= 100.0
