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
