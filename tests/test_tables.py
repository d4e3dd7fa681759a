from linkgraph.tables import TableStore, iceberg_available


def test_parquet_fallback_roundtrip(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "tbl"))
    assert not store.iceberg  # no Iceberg jars in this container
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    store.write("t", df)
    assert {(r["id"], r["v"]) for r in store.read("t").collect()} == {(1, "a"), (2, "b")}

    store.append("t", spark.createDataFrame([(3, "c")], "id bigint, v string"))
    assert store.read("t").count() == 3


def test_parquet_upsert(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "tbl2"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    store.write("t", df)
    store.upsert("t", spark.createDataFrame([(2, "B"), (4, "d")], "id bigint, v string"), "id")
    got = {r["id"]: r["v"] for r in store.read("t").collect()}
    assert got == {1: "a", 2: "B", 4: "d"}


def test_iceberg_detection_is_false_without_jars(spark):
    assert iceberg_available(spark) is False


def test_upsert_concurrent_writers_no_lost_update(spark, tmp_path):
    """Two writers upserting concurrently: both sets of keys survive
    (the unlocked read-merge-swap would drop the first committer's
    rows); the contended key ends as exactly one writer's value."""
    import threading

    from linkgraph.tables import TableStore

    store = TableStore(spark, str(tmp_path / "store"))
    base = spark.createDataFrame([(1, "base1"), (2, "base2")], "k bigint, v string")
    store.write("t", base)

    errs = []

    def writer(tag):
        try:
            df = spark.createDataFrame(
                [(2, f"two-{tag}"), (10 + tag, f"new-{tag}")], "k bigint, v string"
            )
            store.upsert("t", df, "k")
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    threads = [threading.Thread(target=writer, args=(t,)) for t in (1, 2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    rows = {r["k"]: r["v"] for r in store.read("t").collect()}
    assert set(rows) == {1, 2, 11, 12}
    assert rows[1] == "base1"
    assert rows[2] in ("two-1", "two-2")


def test_upsert_lock_times_out(spark, tmp_path):
    import os

    import pytest

    from linkgraph.tables import TableStore

    store = TableStore(spark, str(tmp_path / "store2"))
    path = store._path("t")
    os.makedirs(path + ".lock")  # stale/foreign lock
    df = spark.createDataFrame([(1, "x")], "k bigint, v string")
    with pytest.raises(TimeoutError):
        store._acquire_lock(path, timeout_s=0.2)
    os.rmdir(path + ".lock")
    store.upsert("t", df, "k")
    assert store.read("t").count() == 1


def test_lock_heartbeat_prevents_stale_steal(spark, tmp_path):
    """A live holder's lock is refreshed by the heartbeat, so a second
    writer with a tiny staleness window must WAIT (not steal) — then
    both writers' rows survive. With the pre-heartbeat behavior the
    second writer would break the lock mid-merge and the first commit
    could be lost."""
    import threading
    import time as _time

    from linkgraph.tables import TableStore

    # stale window far below the merge duration; heartbeat every ~0.25s
    store = TableStore(spark, str(tmp_path / "hb"), lock_stale_s=1.0)
    store.write("t", spark.createDataFrame([(1, "base")], "k bigint, v string"))

    release = threading.Event()
    orig_upsert = TableStore.upsert

    def slow_writer():
        lock = store._acquire_lock(store._path("t"))
        from linkgraph.tables import _LockHeartbeat

        hb = _LockHeartbeat(lock, 0.25)
        try:
            release.wait(10)  # hold the lock well past lock_stale_s
        finally:
            hb.stop()
            import os

            os.rmdir(lock)

    t1 = threading.Thread(target=slow_writer)
    t1.start()
    _time.sleep(2.5)  # > lock_stale_s: an unheartbeated lock would be stolen
    stolen = []

    def second_writer():
        try:
            store.upsert(
                "t",
                spark.createDataFrame([(2, "two")], "k bigint, v string"),
                "k",
            )
        except TimeoutError:
            stolen.append("timeout")

    t2 = threading.Thread(target=second_writer)
    t2.start()
    _time.sleep(1.0)
    assert t2.is_alive()  # still waiting — the lock was NOT stolen
    release.set()
    t1.join(10)
    t2.join(30)
    assert not stolen
    rows = {r["k"]: r["v"] for r in store.read("t").collect()}
    assert rows == {1: "base", 2: "two"}
    assert orig_upsert is TableStore.upsert


def test_upsert_multi_table_concurrent(spark, tmp_path):
    """Concurrent writers across DIFFERENT tables don't serialize on one
    lock (per-table fences) and nothing is lost on either table."""
    import threading

    from linkgraph.tables import TableStore

    store = TableStore(spark, str(tmp_path / "multi"))
    for name in ("ta", "tb"):
        store.write(name, spark.createDataFrame([(1, "base")], "k bigint, v string"))
    errs = []

    def writer(name, tag):
        try:
            store.upsert(
                name,
                spark.createDataFrame([(tag, f"{name}-{tag}")], "k bigint, v string"),
                "k",
            )
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    threads = [
        threading.Thread(target=writer, args=(n, t))
        for n in ("ta", "tb")
        for t in (2, 3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    for name in ("ta", "tb"):
        rows = {r["k"]: r["v"] for r in store.read(name).collect()}
        assert rows == {1: "base", 2: f"{name}-2", 3: f"{name}-3"}
