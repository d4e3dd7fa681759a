"""Physical-plan regression tests: the scale properties the docs claim
(docs/PLANS.md) asserted mechanically, so a refactor that silently adds
an exchange, drops a pushdown, or falls back to a sort-merge join fails
CI instead of only showing up at 100 TB.

Each test captures ``df.explain(...)`` output and asserts on plan-node
substrings. They assert RELATIVE exchange counts where a cached
lineage legitimately contains its one-time repartition exchange.
"""

from __future__ import annotations

import contextlib
import io
import os

import pytest
from pyspark.sql import functions as F

from linkgraph import ops
from linkgraph.pipeline import dedup
from linkgraph.session import load_table

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "lineitem.parquet")),
    reason="driver testdata not present",
)


def plan_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def n_exchanges(plan: str) -> int:
    """Shuffle-exchange tree nodes only: formatted mode prints each node
    twice ("+- Exchange (4)" in the tree, "(4) Exchange" in the detail),
    and Broadcast/ReusedExchange are not data shuffles."""
    import re

    return len(re.findall(r"(?<![A-Za-z])Exchange \(\d+\)", plan))


def test_scan_prunes_columns_and_pushes_filters(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    q = li.where(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    plan = plan_str(q)
    assert "PushedFilters" in plan and "GreaterThan(l_quantity" in plan
    # ReadSchema must carry only the two referenced columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema, plan
    assert "l_orderkey" in read_schema[0] and "l_quantity" in read_schema[0]
    assert "l_extendedprice" not in read_schema[0]
    assert "l_returnflag" not in read_schema[0]


def test_global_topk_is_take_ordered_not_full_sort(spark):
    orders = load_table(spark, SF_DIR, "orders")
    q = ops.order_limit(orders, [F.col("o_totalprice").desc()], k=10)
    plan = plan_str(q)
    assert "TakeOrderedAndProject" in plan
    # no Sort operator node anywhere — TakeOrderedAndProject keeps k
    # rows per partition and merges on the driver (formatted mode
    # prints operator nodes as "Sort (<n>)")
    import re

    assert not re.search(r"(?<![A-Za-z])Sort \(\d+\)", plan), plan


def test_grouped_topk_is_single_exchange(spark):
    orders = load_table(spark, SF_DIR, "orders")
    q = ops.top_k(orders, ["o_custkey"], [F.col("o_totalprice").desc()], 3)
    plan = plan_str(q)
    assert "Window" in plan
    assert n_exchanges(plan) == 1, plan
    # Spark 4 bonus worth pinning: a PARTIAL WindowGroupLimit runs
    # map-side, so each input partition ships at most k rows per group
    # into the one exchange — the property that makes grouped top-k
    # safe under 100 TB skew
    assert "row_number(), 3, Partial" in plan, plan


def test_small_dim_join_broadcasts(spark):
    orders = load_table(spark, SF_DIR, "orders")
    cust = load_table(spark, SF_DIR, "customer")
    q = orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
    plan = plan_str(q)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pagerank_broadcast_superstep_message_agg_is_exchange_free(
    spark, tiny_edges
):
    """The broadcast-plan superstep shape (algos/pagerank.py:117-151):
    edges cached hash(dst, P); state broadcast; message aggregation on
    dst must add ZERO exchanges beyond the cache's one-time repartition
    — the groupBy(dst) inherits the cache partitioning."""
    e = tiny_edges.select("src", "dst").repartition(4, "dst").persist()
    e.count()  # materialize so the test measures the steady-state plan
    try:
        # the cache's one-time repartition appears TWICE in a
        # materialized AQE plan (== Initial Plan == and == Final Plan ==
        # inside InMemoryRelation) — measure it so the assertion below
        # is "zero exchanges beyond the cache lineage", however printed
        base_exchanges = n_exchanges(plan_str(e))
        active = F.broadcast(
            tiny_edges.select(
                F.col("src").alias("vid"), F.lit(1.0).alias("contrib")
            )
        )
        sums = (
            e.join(active, e["src"] == active["vid"])
            .select("dst", "contrib")
            .groupBy("dst")
            .agg(F.sum("contrib").alias("msum"))
        )
        plan = plan_str(sums)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        assert n_exchanges(plan) == base_exchanges, plan
    finally:
        e.unpersist()


def test_minhash_signature_has_map_side_combine(spark):
    docs = load_table(spark, SF_DIR, "documents")
    sig = dedup.minhash_signature(docs, num_hashes=8)
    # simple physical plan shows partial_min before the exchange — the
    # map-side combine that collapses each doc's shingles pre-shuffle
    plan = plan_str(sig, mode="simple")
    assert "partial_min" in plan, plan
    partial_pos = plan.index("partial_min")
    # plan prints top-down: the final agg's Exchange appears ABOVE
    # (before) the partial HashAggregate feeding it
    exchange_pos = plan.index("Exchange")
    assert exchange_pos < partial_pos, plan


def test_pagerank_exchange_plan_partially_aggregates_before_shuffle(
    spark, tiny_edges
):
    """The exchange-plan superstep (pagerank broadcast_state=False, the
    10^12-doc regime): messages groupBy(dst) over a src-partitioned edge
    cache must show a PARTIAL HashAggregate below its exchange — the
    E-row stream collapses to ~|V| partial sums per partition before
    anything crosses the wire."""
    e = tiny_edges.select("src", "dst").repartition(4, "src").persist()
    e.count()
    try:
        state = tiny_edges.select(
            F.col("src").alias("vid"), F.lit(1.0).alias("contrib")
        )
        joined = e.join(state, e["src"] == state["vid"]).select("dst", "contrib")
        sums = joined.groupBy("dst").agg(F.sum("contrib").alias("msum"))
        plan = plan_str(sums, mode="simple")
        assert "partial_sum" in plan, plan
        # top-down print: final agg's Exchange is ABOVE the partial agg
        assert plan.index("Exchange") < plan.index("partial_sum"), plan
    finally:
        e.unpersist()


def test_two_phase_agg_is_two_exchanges_salted_then_keyed(spark):
    """ops.two_phase_agg (the explicit hot-key path): phase 1 shuffles
    on (key, salt) so a power-law hot key spreads over salt_buckets
    reducers; phase 2 shuffles |keys|*salt rows only. Both phases also
    map-side combine (partial_ functions below each exchange)."""
    orders = load_table(spark, SF_DIR, "orders")
    q = ops.two_phase_agg(
        orders, "o_custkey", {"s": (F.sum, F.sum, "o_totalprice")}, salt_buckets=8
    )
    plan = plan_str(q)
    assert n_exchanges(plan) == 2, plan
    assert "__salt__" in plan
    simple = plan_str(q, mode="simple")
    assert simple.count("partial_sum") >= 2, simple


def test_bucketed_join_no_exchange(spark, tmp_path):
    """TableStore.write_bucketed: two tables hash-bucketed the same way
    join on the bucket key with ZERO shuffle exchanges — each task reads
    matching buckets from both sides (co-located join, the durable form
    of the in-memory repartition the iterative kernels use). sortBy on
    the bucket key additionally removes the per-task Sort."""
    from linkgraph.tables import TableStore

    store = TableStore(spark, str(tmp_path / "bstore"))
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_partkey"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    store.write_bucketed("b_lineitem", li, ("l_orderkey",), 8,
                         sort_cols=("l_orderkey",))
    store.write_bucketed("b_orders", orders, ("o_orderkey",), 8,
                         sort_cols=("o_orderkey",))
    a = store.read_bucketed("b_lineitem")
    b = store.read_bucketed("b_orders")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, a["l_orderkey"] == b["o_orderkey"]).groupBy(
            "l_orderkey"
        ).agg(F.sum(F.col("l_quantity") * F.col("o_totalprice")).alias("s"))
        plan = plan_str(j)
        assert "SortMergeJoin" in plan, plan
        assert n_exchanges(plan) == 0, plan
        assert "SelectedBucketsCount" in plan, plan
        # correctness: same result as the unbucketed join
        expect = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("l_orderkey")
            .agg(F.sum(F.col("l_quantity") * F.col("o_totalprice")).alias("s"))
        )
        got = {(r["l_orderkey"], round(r["s"], 2)) for r in j.collect()}
        exp = {(r["l_orderkey"], round(r["s"], 2)) for r in expect.collect()}
        assert got == exp
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
