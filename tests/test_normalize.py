from pyspark.sql import functions as F

from linkgraph.extract import extracted_edges
from linkgraph.normalize import (
    assign_contiguous_ids,
    canonicalize_url,
    normalize_graph,
)


def test_canonicalize_url_cases():
    cases = {
        "HTTPS://WWW.Example.COM:443/p/1#frag": "https://www.example.com/p/1",
        "http://example.com:80/": "http://example.com/",
        "https://example.com": "https://example.com/",
        "https://example.com/a/./b/../c": "https://example.com/a/c",
        "https://example.com/a/": "https://example.com/a",
        "https://example.com/?q=1": "https://example.com/?q=1",
        "https://example.com:8443/x": "https://example.com:8443/x",
    }
    for raw, want in cases.items():
        assert canonicalize_url(raw) == want, raw


def test_assign_contiguous_ids(spark):
    df = spark.createDataFrame([(w,) for w in "delta alpha echo bravo charlie".split()], "k string")
    out = assign_contiguous_ids(df, "k", "vid", num_partitions=3).collect()
    got = {r["k"]: r["vid"] for r in out}
    assert got == {"alpha": 0, "bravo": 1, "charlie": 2, "delta": 3, "echo": 4}


def test_normalize_graph_end_to_end(spark, tiny_pages):
    pages, plan = tiny_pages
    raw = extracted_edges(pages)
    vertices, edges = normalize_graph(raw)
    # vertex set = endpoints of the expected canonical edge set
    exp_urls = {u for e in plan.edge_urls() for u in e}
    assert {r["url"] for r in vertices.collect()} == exp_urls
    vids = [r["vid"] for r in vertices.orderBy("vid").collect()]
    assert vids == list(range(len(exp_urls)))  # contiguous 0..V-1
    # edge set matches the plan exactly after id mapping
    url_of = {r["vid"]: r["url"] for r in vertices.collect()}
    got = {(url_of[r["src"]], url_of[r["dst"]]) for r in edges.collect()}
    assert got == plan.edge_urls()
    # no self loops, no duplicates
    assert edges.where(F.col("src") == F.col("dst")).count() == 0
    assert edges.count() == edges.select("src", "dst").distinct().count()


def test_latest_snapshot_multi_version(spark):
    import datetime as dt

    from linkgraph.normalize import latest_snapshot

    t = lambda d: dt.datetime(2024, 1, d)  # noqa: E731
    pages = spark.createDataFrame(
        [
            ("a", t(1), "a-v1"),
            ("a", t(5), "a-v2"),
            ("a", t(9), "a-v3"),
            ("b", t(3), "b-v1"),
        ],
        "url string, warc_ts timestamp, html string",
    )
    latest = {r["url"]: r["html"] for r in latest_snapshot(pages).collect()}
    assert latest == {"a": "a-v3", "b": "b-v1"}
    asof = {
        r["url"]: r["html"]
        for r in latest_snapshot(pages, as_of=t(6)).collect()
    }
    assert asof == {"a": "a-v2", "b": "b-v1"}
    # as_of before any capture of a url -> that url absent from the snapshot
    early = {r["url"] for r in latest_snapshot(pages, as_of=t(2)).collect()}
    assert early == {"a"}
