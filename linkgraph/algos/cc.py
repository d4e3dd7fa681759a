"""Connected components: hash-min label propagation + large-star/small-star.

Semantics (frozen): undirected connectivity over edges(src, dst);
component id = min vid of the component (the canonicalization FIXTURES.md
requires). The min-propagation update mirrors the reference's
keep-shortest-path min-semantics UDAF
(/root/reference/reasoner/udf/src/main/java/com/antgroup/openspg/reasoner/udf/builtin/udaf/KeepShortestPath.java:24-25).

Two modes:
  * ``hash-min`` — one superstep = take the min component id over the
    in-neighborhood. O(diameter) supersteps; best for shallow web graphs.
  * ``two-phase`` (large-star/small-star, Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14 — public algorithm) —
    O(log² n) rounds on deep/path-like graphs. Each round rewires edges
    toward local minima; both phases are plain join+groupBy+min.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph import pregel


def _undirected(edges: DataFrame) -> DataFrame:
    e = edges.select("src", "dst")
    return e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


BROADCAST_STATE_MAX_VERTICES = 20_000_000


def connected_components(
    edges: DataFrame,
    *,
    vertices: DataFrame | None = None,
    max_iter: int = 50,
    algorithm: str = "hash-min",
    broadcast_state: bool | None = None,
    num_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    job_id: str = "cc",
    checkpoint_every: int = 5,
    resume: bool = True,
    init_labels: DataFrame | None = None,
) -> pregel.PregelResult:
    """Returns state (vid, component) with component = min member vid.

    ``init_labels`` (vid, component) warm-starts hash-min from a
    previous run's labels — the incremental-crawl path: old labels are
    min-vids of old components, old components are subsets of new ones
    and their min vids are still members, so min-propagation from the
    old labels converges to exactly the same canonical min-member-vid
    labeling (tested equal), in fewer rounds when the delta only merges
    a few components. New vertices start at their own vid as usual.

    Same physical strategy as pagerank (see docs/PLANS.md): the
    undirected edge frame is cached hash-partitioned by ``dst``; with a
    broadcastable state each superstep is BroadcastHashJoin -> exchange-
    free min-aggregate -> co-partitioned merge-join update. Exchange
    plan for huge V via ``broadcast_state=False``.
    """
    if algorithm == "two-phase":
        return _star_contraction(
            edges, vertices=vertices, max_iter=max_iter,
            checkpoint_dir=checkpoint_dir, job_id=job_id,
        )
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    if vertices is None:
        verts = _undirected(edges).select(F.col("src").alias("vid")).distinct()
    else:
        verts = vertices.select("vid")
    verts = verts.persist()
    n = verts.count()
    if broadcast_state is None:
        broadcast_state = n <= BROADCAST_STATE_MAX_VERTICES

    part_key = "dst" if broadcast_state else "src"
    und = _undirected(edges).repartition(num_partitions, part_key).persist()
    if init_labels is not None:
        # warm start is only SOUND for edge-additive deltas (old
        # components are subsets of new ones). Guard the two ways a
        # stale prior can poison hash-min (labels only ever decrease,
        # so a too-small seed is never corrected):
        #  1) a prior label naming a vid that no longer exists — drop
        #     it here (seed falls back to the vertex's own vid);
        #  2) a prior label from a component that has since SPLIT —
        #     not detectable at seed time; caught by the post-hoc
        #     validation below, which falls back to a cold run.
        label_vids = verts.select(F.col("vid").alias("_lv"))
        prior = (
            init_labels.select("vid", F.col("component").alias("_prior"))
            .join(label_vids, F.col("_prior") == F.col("_lv"), "left_semi")
        )
        init = verts.join(prior, "vid", "left").select(
            "vid",
            # never seed ABOVE the vid: min(prior, vid) keeps the
            # invariant that labels are component-member vids
            F.least(F.coalesce("_prior", F.col("vid")), F.col("vid")).alias(
                "component"
            ),
        )
    else:
        init = verts.select("vid", F.col("vid").alias("component"))
    init = init.repartition(num_partitions, "vid")

    def superstep(edges_df: DataFrame, state: DataFrame, i: int) -> DataFrame:
        s = F.broadcast(state) if broadcast_state else state
        msgs = (
            edges_df.join(s, edges_df["src"] == s["vid"])
            .groupBy(F.col("dst").alias("mvid"))
            .agg(F.min("component").alias("mmin"))
        )
        return state.hint("merge").join(
            msgs, state["vid"] == msgs["mvid"], "left"
        ).select(
            "vid",
            F.least(
                F.col("component"), F.coalesce(F.col("mmin"), F.col("component"))
            ).alias("component"),
        )

    def delta(old: DataFrame, new: DataFrame) -> float:
        return pregel.changed_count(old, new, "vid", "component")

    try:
        res = pregel.run_pregel(
            und,
            init,
            superstep,
            delta,
            max_iter=max_iter,
            tol=0.0,
            checkpoint_dir=checkpoint_dir,
            job_id=job_id,
            checkpoint_every=checkpoint_every,
            resume=resume,
        )
        if init_labels is not None and res.converged:
            # post-hoc soundness check (one O(V) agg): after min-
            # propagation every component carries ONE label = min of
            # its seeds; it equals min(member vid) iff no stale seed
            # leaked in (a split delta leaks one). On violation, the
            # warm start was invalid — rerun cold rather than return
            # labels that break the min-member-vid contract.
            bad = (
                res.state.groupBy("component")
                .agg(F.min("vid").alias("_mv"))
                .where(F.col("component") != F.col("_mv"))
                .limit(1)
                .count()
            )
            if bad:
                import warnings

                warnings.warn(
                    "cc init_labels came from a non-additive delta "
                    "(a component split); falling back to a cold run"
                )
                return connected_components(
                    edges,
                    vertices=vertices,
                    max_iter=max_iter,
                    algorithm=algorithm,
                    broadcast_state=broadcast_state,
                    num_partitions=num_partitions,
                    checkpoint_dir=checkpoint_dir,
                    job_id=job_id + "_cold",
                    checkpoint_every=checkpoint_every,
                    resume=resume,
                )
        return res
    finally:
        verts.unpersist()
        und.unpersist()


def _star_contraction(
    edges: DataFrame,
    *,
    vertices: DataFrame | None,
    max_iter: int,
    checkpoint_dir: str | None,
    job_id: str,
) -> pregel.PregelResult:
    """Alternating large-star / small-star until the edge set is stable.

    State here is the evolving parent-pointer edge set; converges in
    O(log² n) rounds, robust to long path graphs where hash-min needs
    O(diameter) rounds.
    """
    spark = edges.sparkSession
    e = (
        _undirected(edges)
        .where(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    metrics: list[dict] = []
    import time

    it = 0
    converged = False
    while it < max_iter:
        t0 = time.monotonic()
        # large-star: every neighbor larger than u links to u's min neighbor
        nbrs = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = nbrs.groupBy("u").agg(F.min("v").alias("m"))
        mins = mins.select("u", F.least("u", "m").alias("m"))
        large = (
            nbrs.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: neighbors ≤ u (plus u) link to the min neighbor
        nbrs2 = large.unionAll(
            large.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).where(F.col("v") < F.col("u"))
        mins2 = nbrs2.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            nbrs2.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionAll(mins2.select(F.col("u"), F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        changed = small.exceptAll(e).count() + e.exceptAll(small).count()
        it += 1
        metrics.append(
            {"job_id": job_id, "superstep": it, "wall_s": round(time.monotonic() - t0, 4), "delta": float(changed)}
        )
        e = small
        if changed == 0:
            # explicit flag: a run whose edge set stabilises exactly on the
            # final allowed round is still converged (it == max_iter here)
            converged = True
            break

    # e is now a forest pointing each vertex at its component min.
    if vertices is None:
        verts = (
            _undirected(edges).select(F.col("src").alias("vid")).distinct()
        )
    else:
        verts = vertices.select("vid")
    comp = verts.join(e, verts["vid"] == e["u"], "left").select(
        "vid", F.coalesce(F.col("v"), F.col("vid")).alias("component")
    )
    return pregel.PregelResult(
        state=comp.localCheckpoint(eager=True),
        iterations=it,
        converged=converged,
        metrics=metrics,
    )
