"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast join of the (tiny)
query set against the corpus, dot products via zip_with/aggregate
(JVM-side, whole-stage codegen). Scale path: LSH bucketing by random
hyperplane sign bits — candidates come from one bucket equi-join, so the
scan is |corpus|/2^planes per query instead of |corpus|.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, vec_id, score) — exact cosine top-k per query.

    queries: (query_id, embedding). Broadcast the queries; per-query
    top-k via window row_number (deterministic tie-break on vec_id).
    """
    from pyspark.sql import Window

    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        )
    )
    scored = corpus.crossJoin(q).select(
        "query_id",
        F.col(id_col).alias("vec_id"),
        cosine(F.col(vec_col), F.col("qvec")).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") <= k)
        .drop("__rn__")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side, broadcast as
    literals — a few KB regardless of corpus size)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id of a vector under the given hyperplanes."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(vec_col, plane) >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket.bitwiseOR(bit)
    return bucket


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-style approximate top-k: partition the corpus into inverted
    lists by nearest centroid; each query scans only its ``n_probe``
    nearest lists (~n_probe/n_centroids of the corpus).

    Centroids are deterministic: the ``n_centroids`` corpus vectors with
    the smallest ids (no iterative training — swap in k-means centroids
    for better recall; the scan/partition plumbing is identical). The
    centroid table is tiny and broadcast; the corpus gets its list id in
    one pass and can be cached/written partitioned by ``list_id`` so
    repeated queries only touch matching partitions.
    """
    from pyspark.sql import Window

    cents = F.broadcast(
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cvec")
        )
    )

    def assign(df: DataFrame, key: str, vcol: str, probes: int) -> DataFrame:
        scored = df.crossJoin(cents).withColumn(
            "__sim__", cosine(F.col(vcol), F.col("cvec"))
        )
        w = Window.partitionBy(key).orderBy(
            F.col("__sim__").desc(), F.col("cent_id").asc()
        )
        return (
            scored.withColumn("__rn__", F.row_number().over(w))
            .where(F.col("__rn__") <= probes)
            .select(df["*"], F.col("cent_id").alias("list_id"))
        )

    lists = assign(
        corpus.select(F.col(id_col), F.col(vec_col).alias("cv")), id_col, "cv", 1
    )
    qlists = assign(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("qv")),
        query_id_col,
        "qv",
        n_probe,
    )
    scored = lists.join(F.broadcast(qlists), "list_id").select(
        query_id_col,
        F.col(id_col).alias("vec_id"),
        cosine(F.col("cv"), F.col("qv")).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") <= k)
        .drop("__rn__")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int | None = None,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket.

    Recall trades off with 2^n_planes; the bucket join key is one long,
    so the shuffle is tiny at any corpus size.
    """
    from pyspark.sql import Window

    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cvec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            lsh_bucket(F.col(vec_col), planes).alias("bucket"),
        )
    )
    scored = c.join(q, "bucket").select(
        "query_id", "vec_id", cosine(F.col("cvec"), F.col("qvec")).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") <= k)
        .drop("__rn__")
    )
