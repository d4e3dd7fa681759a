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
