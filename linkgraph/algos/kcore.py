"""k-core decomposition by iterative peeling.

The k-core is the maximal subgraph where every vertex has (undirected)
degree >= k — the standard web-graph densification/filtering primitive.
Each round drops vertices below k and the edges touching them; rounds
are idempotent once stable, so a FIXED round count is exact whenever it
exceeds the peel depth (the same determinism trick the CC oracle uses).

Each round = one degree aggregation + two semi-joins, all on (src, dst)
pairs; nothing wider ever shuffles, and the edge set only shrinks.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph import pregel


def k_core(
    edges: DataFrame,
    k: int,
    *,
    max_iter: int = 30,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    job_id: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = True,
) -> pregel.PregelResult:
    """Returns state = (vid) rows of the k-core's surviving vertices.

    ``checkpoint_dir`` enables durable per-round checkpoints of the
    shrinking edge set (commit-markered, CheckpointStore layout); a
    killed run resumes from the last committed round — peeling is
    idempotent, so a resumed run is bit-identical to an uninterrupted
    one."""
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    store = (
        pregel.CheckpointStore(checkpoint_dir, job_id or f"kcore{k}")
        if checkpoint_dir
        else None
    )
    metrics: list[dict] = []
    it = 0
    und = None
    if store is not None and resume:
        last = store.latest()
        if last is not None:
            loaded, metrics = store.load(spark, last)
            und = loaded.repartition(num_partitions, "src").localCheckpoint(
                eager=True
            )
            it = last
    if und is None:
        und = (
            edges.select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .unionAll(
                edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            .distinct()
            .repartition(num_partitions, "src")
            .localCheckpoint(eager=True)
        )
    converged = False
    saved = False  # final-state durability check after the loop
    n_edges = und.count()  # carried forward; equals last round's pruned count
    while it < max_iter:
        t0 = time.monotonic()
        alive = (
            und.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") >= k)
            .select(F.col("src").alias("vid"))
        )
        pruned = (
            und.join(alive, und["src"] == alive["vid"], "left_semi")
            .join(
                alive.select(F.col("vid").alias("__d__")),
                und["dst"] == F.col("__d__"),
                "left_semi",
            )
            .localCheckpoint(eager=True)
        )
        n_pruned = pruned.count()
        removed = n_edges - n_pruned
        n_edges = n_pruned
        it += 1
        metrics.append(
            {
                "job_id": f"kcore{k}",
                "superstep": it,
                "wall_s": round(time.monotonic() - t0, 4),
                "delta": float(removed),
            }
        )
        und = pruned
        saved = False
        if store is not None and (it % checkpoint_every == 0 or removed == 0):
            store.save(it, und, metrics)
            saved = True
        if removed == 0:
            converged = True
            break
    if store is not None and it > 0 and not saved:
        store.save(it, und, metrics)  # final round always durable
    core = und.select(F.col("src").alias("vid")).distinct()
    return pregel.PregelResult(
        state=core.localCheckpoint(eager=True),
        iterations=it,
        converged=converged,
        metrics=metrics,
    )
