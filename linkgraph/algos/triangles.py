"""Triangle counting by degree-ordered edge orientation + wedge closure.

Public algorithm (Cohen, "Graph Twiddling in a MapReduce World", 2009;
also Suri & Vassilvitskii WWW'11): orient each undirected edge from the
lower-(degree, vid) endpoint to the higher one; every triangle then has
exactly one wedge (a→b, a→c with b≺c) whose closing edge (b→c) is also
oriented — so one self-join + one semi-join counts each triangle once.

Scale notes:
  * orientation bounds the out-degree of the oriented graph by O(√E) —
    the standard defense against power-law hubs (a hot vertex's edges
    point *into* it, so it never fans out a quadratic wedge set).
  * joins are equi-joins on vertex id; AQE skew-join covers residual skew.

The reference counts 3-cycles via its FinBench trc4 pattern
(/root/reference/reasoner/runner/local-runner/src/test/java/com/antgroup/openspg/reasoner/runner/local/main/finbench/FinBenchTest.java:84-150)
executed as expandInto joins — same join shape, minus the orientation
optimization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _oriented(edges: DataFrame) -> DataFrame:
    """Simple undirected edges oriented by (degree, vid) order."""
    und = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("vid"))
        .unionAll(und.select(F.col("v").alias("vid")))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("vid").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("vid").alias("v"), F.col("deg").alias("dv"))
    withdeg = und.join(du, "u").join(dv, "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return withdeg.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(fwd, F.col("du")).otherwise(F.col("dv")).alias("da"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("db"),
    )


def triangle_list(edges: DataFrame) -> DataFrame:
    """All triangles as (x, y, z) vid triples (each listed once)."""
    o = _oriented(edges).select("a", "b", "da", "db").persist()
    e1 = o.select(F.col("a"), F.col("b").alias("b1"), F.col("db").alias("db1"))
    e2 = o.select(F.col("a"), F.col("b").alias("b2"), F.col("db").alias("db2"))
    wedges = e1.join(e2, "a").where(
        (F.col("db1") < F.col("db2"))
        | ((F.col("db1") == F.col("db2")) & (F.col("b1") < F.col("b2")))
    )
    closing = o.select(F.col("a").alias("b1"), F.col("b").alias("b2"))
    tris = wedges.join(closing, ["b1", "b2"], "left_semi")
    return tris.select(
        F.col("a").alias("x"), F.col("b1").alias("y"), F.col("b2").alias("z")
    )


def triangle_count(edges: DataFrame) -> int:
    """Total number of triangles in the undirected simple graph."""
    return triangle_list(edges).count()


def per_vertex_triangles(edges: DataFrame) -> DataFrame:
    """(vid, triangles) — per-corner counts (vertices in ≥1 triangle)."""
    t = triangle_list(edges)
    corners = (
        t.select(F.col("x").alias("vid"))
        .unionAll(t.select(F.col("y").alias("vid")))
        .unionAll(t.select(F.col("z").alias("vid")))
    )
    return corners.groupBy("vid").agg(F.count(F.lit(1)).alias("triangles"))
