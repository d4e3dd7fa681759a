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
    """All triangles as (x, y, z) vid triples (each listed once).

    Edge-iterator ("compact-forward") form: for each oriented edge
    (a, b), the closing vertices are out(a) ∩ out(b) — an
    array_intersect of the two endpoints' out-adjacency arrays, joined
    to the edge list. Each triangle x→y, x→z, y→z surfaces exactly once,
    at edge (x, y) with z in the intersection — the same (x, y, z)
    triple the earlier wedge+semi-join produced, but the wedge set
    (Σ deg² rows, 22M at sf0.1 for 600k edges) never materializes: the
    whole closure is one codegen stage over |E| rows with O(√E)-bounded
    arrays (the orientation caps out-degree), and only the V-row
    adjacency table is built/shuffled besides the edges themselves.
    """
    # persist the oriented frame (as the pre-r6 implementation did): it
    # feeds BOTH the adjacency aggregate and the edge stream of the
    # closure join, and repeated calls in one session re-hit the cache
    # instead of re-running the orientation joins
    o = _oriented(edges).select("a", "b").persist()
    adj = o.groupBy("a").agg(F.sort_array(F.collect_list("b")).alias("nbrs"))
    adj_a = adj.select(F.col("a"), F.col("nbrs").alias("nbrs_a"))
    adj_b = adj.select(F.col("a").alias("b"), F.col("nbrs").alias("nbrs_b"))
    # inner joins drop sink endpoints (empty out-adjacency closes nothing)
    pairs = o.join(adj_a, "a").join(adj_b, "b")
    return pairs.select(
        F.col("a").alias("x"),
        F.col("b").alias("y"),
        F.explode(F.array_intersect("nbrs_a", "nbrs_b")).alias("z"),
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
