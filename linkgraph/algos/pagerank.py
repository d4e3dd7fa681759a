"""PageRank as Pregel-style DataFrame supersteps.

Semantics (frozen — golden fixtures + the DuckDB oracle in
__spark_entry__.py reproduce exactly this):
  * synchronous power iteration, damping d (default 0.85)
  * init score = 1/N for the N vertices of the graph
  * dangling (out-degree 0) mass redistributed uniformly each step:
      score'(v) = (1-d)/N + d * (Σ_{u→v} score(u)/outdeg(u) + dangling/N)
  * stop when L∞(score' - score) <= tol

The reference has no PageRank (SURVEY.md key negative finding) — this is
built on its iterative expand/aggregate machinery re-expressed in Spark:
message pass = edges⋈state join + groupBy(dst) (LocalRDG.expandInto +
groupBy, /root/reference/reasoner/runner/local-runner/.../rdg/LocalRDG.java:499-610,771-860).

Scale notes:
  * edges are joined on src against a state frame of V rows — edges stay
    partitioned by src (normalize.build_edges) so only messages shuffle.
  * vertex ids never re-join the url table inside the loop (the
    NodeIdToEdgeProperty trick, optimizer/rules/NodeIdToEdgeProperty.scala:34).
  * hot in-degree vertices: message aggregation optionally goes through
    ops.two_phase_agg (salted partial sums) — ``skew_salt > 1``.
  * 2 actions per superstep (dangling sum + convergence delta), both
    O(V) scans of cached state, never O(E).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph import pregel
from linkgraph.ops import two_phase_agg


def pagerank(
    edges: DataFrame,
    *,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    vertices: DataFrame | None = None,
    skew_salt: int = 1,
    checkpoint_dir: str | None = None,
    job_id: str = "pagerank",
    checkpoint_every: int = 5,
    resume: bool = True,
) -> pregel.PregelResult:
    """Run PageRank over edges(src, dst). Returns state (vid, score).

    ``tol=0`` + ``max_iter=k`` gives exactly-k synchronous iterations
    (what the fixed-iteration oracle checks); ``tol=1e-6`` is the
    convergence mode of BASELINE.md.
    """
    spark = edges.sparkSession
    e = edges.select("src", "dst")

    if vertices is None:
        verts = (
            e.select(F.col("src").alias("vid"))
            .unionAll(e.select(F.col("dst").alias("vid")))
            .distinct()
        )
    else:
        verts = vertices.select("vid")
    verts = verts.persist()
    n = verts.count()
    if n == 0:
        return pregel.PregelResult(
            state=spark.createDataFrame([], "vid bigint, score double"),
            iterations=0,
            converged=True,
        )

    deg = e.groupBy(F.col("src").alias("vid")).agg(
        F.count(F.lit(1)).cast("double").alias("out_degree")
    )
    # (vid, out_degree) for every vertex; 0 marks dangling. Cached once,
    # joined into state each superstep (broadcast when V is small).
    degrees = (
        verts.join(deg, "vid", "left")
        .select("vid", F.coalesce("out_degree", F.lit(0.0)).alias("out_degree"))
        .persist()
    )
    degrees.count()

    init = verts.select("vid", F.lit(1.0 / n).alias("score"))

    def superstep(edges_df: DataFrame, state: DataFrame, i: int) -> DataFrame:
        ranked = state.join(degrees, "vid")
        dangling = (
            ranked.where(F.col("out_degree") == 0.0)
            .agg(F.coalesce(F.sum("score"), F.lit(0.0)).alias("s"))
            .collect()[0]["s"]
        )
        contribs = edges_df.join(
            ranked.where(F.col("out_degree") > 0.0),
            edges_df["src"] == ranked["vid"],
        ).select(
            F.col("dst"),
            (F.col("score") / F.col("out_degree")).alias("contrib"),
        )
        if skew_salt > 1:
            sums = two_phase_agg(
                contribs,
                "dst",
                {"msum": (F.sum, F.sum, "contrib")},
                salt_buckets=skew_salt,
            )
        else:
            sums = contribs.groupBy("dst").agg(F.sum("contrib").alias("msum"))
        base = (1.0 - damping) / n
        dang = damping * dangling / n
        return verts.join(sums, verts["vid"] == sums["dst"], "left").select(
            "vid",
            (
                F.lit(base)
                + F.lit(dang)
                + F.lit(damping) * F.coalesce(F.col("msum"), F.lit(0.0))
            ).alias("score"),
        )

    def delta(old: DataFrame, new: DataFrame) -> float:
        return pregel.linf_delta(old, new, "vid", "score")

    return pregel.run_pregel(
        e,
        init,
        superstep,
        delta,
        max_iter=max_iter,
        tol=tol,
        checkpoint_dir=checkpoint_dir,
        job_id=job_id,
        checkpoint_every=checkpoint_every,
        resume=resume,
    )
