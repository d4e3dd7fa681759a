"""Concept-taxonomy operators (the reference's semantic layer).

Parity:
  ConceptEdgeExpand UDTF — expand a vertex's belongTo edge through the
    concept (isA) taxonomy so a pattern written against a general
    concept matches entities tagged with any of its specializations
    (/root/reference/reasoner/udf/src/main/java/com/antgroup/openspg/reasoner/udf/builtin/udtf/ConceptEdgeExpand.java:42-108).
  EdgeToProperty rewrite — fold a to-concept/standard edge into a plain
    vertex property so the hop disappears from the join plan
    (/root/reference/reasoner/lube-logical/src/main/scala/com/antgroup/openspg/reasoner/lube/logical/optimizer/rules/EdgeToProperty.scala:40-70).

Spark shapes: taxonomies are tiny relative to entity tables, so the
closure computes in a handful of small-table self-joins, is broadcast
into the entity-side join, and the expansion never shuffles entities by
anything other than the concept key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def concept_closure(isa: DataFrame, max_depth: int = 20) -> DataFrame:
    """Reflexive-transitive closure of the isA taxonomy.

    isa: (child, parent) concept edges. Returns (concept, ancestor)
    including (c, c). Taxonomies are shallow; each round joins the
    previous delta against the parent pointers (semi-naive), so rounds =
    taxonomy depth and every frame is concept-sized (broadcastable).
    """
    refl = (
        isa.select(F.col("child").alias("concept"))
        .union(isa.select("parent"))
        .distinct()
        .select("concept", F.col("concept").alias("ancestor"))
    )
    full = refl.unionByName(
        isa.select(F.col("child").alias("concept"), F.col("parent").alias("ancestor"))
    ).distinct().localCheckpoint(eager=True)
    delta = full
    converged = False
    for _ in range(max_depth):
        up = isa.select(
            F.col("child").alias("ancestor"), F.col("parent").alias("__p__")
        )
        new = (
            delta.join(up, "ancestor")
            .select("concept", F.col("__p__").alias("ancestor"))
            .distinct()
            .join(full, ["concept", "ancestor"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if new.isEmpty():
            converged = True
            break
        full = full.unionByName(new).localCheckpoint(eager=True)
        delta = new
    if not converged:
        # fail loudly: a silently-truncated closure would make
        # concept_edge_expand miss matches with no signal
        raise RuntimeError(
            f"taxonomy deeper than max_depth={max_depth}; raise the limit"
        )
    return full


def concept_edge_expand(
    belong_to: DataFrame,
    isa: DataFrame,
    target_concepts: list[str] | None = None,
) -> DataFrame:
    """Every (entity, concept) pair reachable by generalizing the
    entity's direct belongTo tags up the taxonomy — the ConceptEdgeExpand
    UDTF as a broadcast join instead of a per-row tree walk.

    belong_to: (entity, concept); isa: (child, parent).
    ``target_concepts`` optionally restricts the output to a concept set
    (the UDTF's conceptIds argument) — applied to the closure BEFORE the
    entity join, so the broadcast side shrinks first.
    """
    closure = concept_closure(isa)
    if target_concepts is not None:
        closure = closure.where(F.col("ancestor").isin(list(target_concepts)))
    return (
        belong_to.join(F.broadcast(closure), "concept")
        .select("entity", F.col("ancestor").alias("concept"))
        .distinct()
    )


def edge_to_property(
    entities: DataFrame,
    edges: DataFrame,
    out_col: str,
    entity_col: str = "entity",
    value_col: str = "concept",
) -> DataFrame:
    """EdgeToProperty rewrite: fold a to-concept edge into a vertex
    property column (min value for determinism when an entity carries
    several tags), turning a later pattern hop into a projection/filter
    Catalyst can push into the scan."""
    prop = edges.groupBy(entity_col).agg(F.min(value_col).alias(out_col))
    return entities.join(F.broadcast(prop), entity_col, "left")
