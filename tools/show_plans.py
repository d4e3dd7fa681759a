"""Print formatted physical plans for the headline queries (docs/PLANS.md).
Usage: PYTHONPATH=. python tools/show_plans.py [sf_dir]"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import __spark_entry__ as m  # noqa: E402
from linkgraph.session import get_spark  # noqa: E402


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plans", cores=8, shuffle_partitions=8, driver_memory="8g")
    for name in ["q1_agg", "q2_join_topk", "q3_topk_per_group", "g_degree_topk", "d_exact_dedup"]:
        print("=" * 24, name, "=" * 24)
        m.queries()[name](spark, sf).explain("formatted")
    print("=" * 24, "pagerank message aggregation (broadcast mode)", "=" * 24)
    from pyspark.sql import functions as F

    e = m._edges(spark, sf).repartition(8, "dst").persist()
    e.count()
    verts = (
        e.select(F.col("src").alias("vid"))
        .unionAll(e.select(F.col("dst").alias("vid")))
        .distinct()
    )
    deg = e.groupBy(F.col("src").alias("vid")).agg(F.count(F.lit(1)).cast("double").alias("d"))
    state = verts.join(deg, "vid", "left").select(
        "vid", F.lit(1.0).alias("score"), F.coalesce("d", F.lit(0.0)).alias("out_degree")
    ).localCheckpoint(eager=True)
    active = state.where("out_degree > 0").select(
        "vid", (F.col("score") / F.col("out_degree")).alias("contrib")
    )
    msg = e.join(F.broadcast(active), e["src"] == active["vid"]).groupBy("dst").agg(
        F.sum("contrib").alias("msum")
    )
    msg.explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
