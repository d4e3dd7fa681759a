"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast join of the (tiny)
query set against the corpus, dot products via zip_with/aggregate
(JVM-side, whole-stage codegen). Scale paths: LSH bucketing by random
hyperplane sign bits (candidates from one bucket equi-join, scan is
|corpus|/2^planes per query), IVF inverted lists over literal seeded
centroids (scan is ~n_probe/n_centroids), and product quantization
(pq_codebooks/pq_encode/pq_topk: encode once to m-byte codes by a
zero-shuffle projection, then asymmetric-distance scans touch only the
codes column — the memory-side compression that complements the
IVF/LSH scan reductions at 10^12 vectors).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkgraph.pipeline.dedup import _anchor_hot_buckets


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

    Norms are projected ONCE per corpus row and once per query before
    the cross join (r6) — cosine then costs one dot product per
    (row, query) instead of three; values are bit-identical
    (dot / (norm_a * norm_b), same ops, same order).
    """
    from pyspark.sql import Window

    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            _norm(F.col(vec_col)).alias("qnorm"),
        )
    )
    cn = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cnorm"),
    )
    scored = cn.crossJoin(q).select(
        "query_id",
        "vec_id",
        (_dot(F.col("cvec"), F.col("qvec")) / (F.col("cnorm") * F.col("qnorm"))).alias(
            "score"
        ),
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


def seeded_centroids(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> list[tuple[int, list[float]]]:
    """Deterministic pseudo-random centroid sample: the ``n_centroids``
    corpus vectors ranked smallest by a seeded affine hash of their id —
    a uniform sample reproducible in SQL (unlike round 1's lowest-id
    pick, whose recall depended on id assignment). One tiny top-k +
    collect; the result is embedded as plan literals."""
    from linkgraph.pipeline import phash

    (a, b) = phash.seeded_coeffs(1, seed)[0]
    rows = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(
            (F.col(id_col).cast("long") * F.lit(a) + F.lit(b)) % F.lit(phash.P),
            F.col(id_col).asc(),
        )
        .limit(n_centroids)
        .collect()
    )
    return [(int(r[0]), [float(x) for x in r[1]]) for r in rows]


def kmeans_refine(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    iters: int = 3,
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Optional Lloyd refinement of seeded centroids (better recall; not
    used by the oracle-checked query because float group-sums are
    order-nondeterministic across engines). Each iteration is one
    projection-assign + one groupBy avg — no crossJoin, no window."""
    dim = len(centroids[0][1])
    cents = centroids
    for _ in range(iters):
        assigned = corpus.select(
            F.col(vec_col), _nearest_centroid(F.col(vec_col), cents).alias("list_id")
        )
        means = (
            assigned.groupBy("list_id")
            .agg(
                *[
                    F.avg(F.col(vec_col)[i].cast("double")).alias(f"m{i}")
                    for i in range(dim)
                ]
            )
            .collect()
        )
        by_id = {int(r["list_id"]): [float(r[f"m{i}"]) for i in range(dim)] for r in means}
        cents = [(cid, by_id.get(cid, vec)) for cid, vec in cents]
    return cents


def _lit_norm(cvec: list[float]) -> float:
    """Driver-side L2 norm of a literal centroid, replicating _norm's
    accumulation order exactly (sequential acc + x*x, then sqrt) so the
    value is bit-identical to evaluating _norm over the literal array."""
    import math

    s = 0.0
    for x in cvec:
        s = s + float(x) * float(x)
    return math.sqrt(s)


def _bind_scalar(scalar: Column, fn) -> Column:
    """Evaluate ``scalar`` ONCE per row and feed it to ``fn`` as a bound
    lambda variable (transform over a 1-element array): common-
    subexpression elimination by construction — projection collapse
    cannot re-inline the scalar into every use site."""
    return F.transform(F.array(scalar), fn)[0]


def _nearest_centroid(
    vec: Column, centroids: list[tuple[int, list[float]]]
) -> Column:
    """argmax-by-cosine over literal centroids as a pure projection —
    zero shuffle (round 1 did crossJoin(corpus, centroids) + a window
    partitioned per vec_id, a full corpus×n_centroids exchange).

    greatest() over (sim, -cent_id) structs = highest cosine, lowest
    cent_id on ties — the same order as ROW_NUMBER(sim DESC, cent_id ASC)
    in the DuckDB oracle. The row vector's norm is bound ONCE per row
    (r6) and the centroid norms are driver-computed literals, so each
    centroid costs one dot product instead of three; values are
    bit-identical (same ops, same order)."""

    def best_of(nv: Column) -> Column:
        structs = [
            F.struct(
                (
                    _dot(vec, F.array(*[F.lit(float(x)) for x in cvec]))
                    / (nv * F.lit(_lit_norm(cvec)))
                ).alias("s"),
                F.lit(-cid).cast("long").alias("nc"),
            )
            for cid, cvec in centroids
        ]
        best = F.greatest(*structs) if len(structs) > 1 else structs[0]
        return -best["nc"]

    return _bind_scalar(_norm(vec), best_of).alias("list_id")


def _probe_lists(
    vec: Column, centroids: list[tuple[int, list[float]]], n_probe: int
) -> Column:
    """Array of the ``n_probe`` nearest centroid ids — also projection-
    only, with the same once-per-row norm binding as _nearest_centroid."""

    def probes_of(nv: Column) -> Column:
        structs = F.array(
            *[
                F.struct(
                    (
                        _dot(vec, F.array(*[F.lit(float(x)) for x in cvec]))
                        / (nv * F.lit(_lit_norm(cvec)))
                    ).alias("s"),
                    F.lit(-cid).cast("long").alias("nc"),
                )
                for cid, cvec in centroids
            ]
        )
        top = F.slice(F.sort_array(structs, asc=False), 1, n_probe)
        return F.transform(top, lambda st: -st["nc"])

    return _bind_scalar(_norm(vec), probes_of)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 7,
    kmeans_iters: int = 0,
) -> DataFrame:
    """IVF-style approximate top-k: partition the corpus into inverted
    lists by nearest centroid; each query scans only its ``n_probe``
    nearest lists (~n_probe/n_centroids of the corpus).

    Centroids are a seeded pseudo-random sample of corpus vectors
    (optionally Lloyd-refined via ``kmeans_iters``), embedded as plan
    literals: list assignment is a pure projection (argmax over the
    literal centroid structs — zero shuffle, verified in docs/PLANS.md),
    so the corpus can be written/cached partitioned by ``list_id`` and
    repeated queries touch only matching partitions.
    """
    from pyspark.sql import Window

    cents = seeded_centroids(corpus, n_centroids, id_col, vec_col, seed)
    if kmeans_iters:
        cents = kmeans_refine(corpus, cents, kmeans_iters, vec_col)

    # query-side norms are precomputed (tiny broadcast side); the
    # corpus-side norm is evaluated per candidate PAIR — expected
    # candidates per corpus row is |queries|·n_probe/n_centroids (≈1 at
    # the shipped parameters, 0 for rows in unprobed lists), so a
    # per-row precompute would also double up with the norm already
    # bound inside the centroid assignment. Values bit-identical.
    lists = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("cv"),
        _nearest_centroid(F.col(vec_col), cents).alias("list_id"),
    )
    qprobes = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
        F.explode(_probe_lists(F.col(vec_col), cents, n_probe)).alias("list_id"),
    )
    scored = lists.join(F.broadcast(qprobes), "list_id").select(
        query_id_col,
        F.col(id_col).alias("vec_id"),
        (
            _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * F.col("qn"))
        ).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") <= k)
        .drop("__rn__")
    )


def pq_codebooks(
    corpus: DataFrame,
    m_subspaces: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: for subspace ``j`` the codewords
    are the j-th subvectors of ``n_codes`` corpus vectors picked by a
    seeded affine id-hash rank (seed offset per subspace so subspaces
    draw different samples). Deterministic and reproducible in SQL —
    the same sampling trick as ``seeded_centroids``. Training-free by
    design: a Lloyd-refined codebook quantizes better but its float
    group-means are engine-order-dependent, which would break the
    DuckDB hash gate; the seeded sample keeps both engines bit-equal.

    Returns ``books[j][c] = codeword`` (list of sub-dim floats).

    Single corpus pass (r6): all ``m_subspaces`` affine ranks are
    emitted per row (an explode of m (j, rank_j, subvector_j) structs —
    m× the rows but the same bytes, each struct carries only its
    dim/m-float slice) and the per-subspace top-``n_codes`` resolve in
    one grouped top-k, whose partial WindowGroupLimit ships at most
    n_codes rows per subspace per input partition. The previous form
    ran one TakeOrdered pass over the whole corpus PER subspace; the
    selected rows — minimal by (rank_j, id) — and hence the codebooks
    are identical."""
    from pyspark.sql import Window

    from linkgraph.pipeline import phash

    dim = len(corpus.select(vec_col).first()[0])
    assert dim % m_subspaces == 0, "dim must divide evenly into subspaces"
    sub = dim // m_subspaces
    coeffs = [phash.seeded_coeffs(1, seed + j)[0] for j in range(m_subspaces)]
    structs = [
        F.struct(
            F.lit(j).alias("j"),
            (
                (F.col(id_col).cast("long") * F.lit(a) + F.lit(b)) % F.lit(phash.P)
            ).alias("rank"),
            F.slice(F.col(vec_col), j * sub + 1, sub).alias("subv"),
        )
        for j, (a, b) in enumerate(coeffs)
    ]
    pairs = corpus.select(
        F.col(id_col).alias("__id__"), F.explode(F.array(*structs)).alias("s")
    ).select("__id__", "s.j", "s.rank", "s.subv")
    w = Window.partitionBy("j").orderBy(
        F.col("rank").asc(), F.col("__id__").asc()
    )
    rows = (
        pairs.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") <= n_codes)
        .collect()
    )
    books: list[list[list[float]]] = [[] for _ in range(m_subspaces)]
    for r in sorted(rows, key=lambda r: (r["j"], r["__rn__"])):
        books[r["j"]].append([float(x) for x in r["subv"]])
    return books


def _sq_l2(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    corpus: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector to its PQ code array: per subspace the index
    of the nearest codeword by squared L2, ties to the lowest code.
    Pure projection over literal codewords — ZERO shuffle (the plan is
    Project over the scan; docs/PLANS.md "PQ group"), so encoding 10^12
    vectors is one embarrassingly-parallel pass, and the stored
    ``codes`` column is m bytes instead of 4*dim — the 256x compression
    that makes the re-rank corpus driver-broadcastable."""
    m = len(books)
    sub = len(books[0][0])
    cols = [F.col(id_col)]
    codes = []
    for j, book in enumerate(books):
        subv = F.slice(F.col(vec_col), j * sub + 1, sub)
        # least() over (dist, code) structs = min distance, lowest code
        # on ties — mirrors ROW_NUMBER(dist ASC, code ASC) in DuckDB
        structs = [
            F.struct(
                _sq_l2(subv, F.array(*[F.lit(x) for x in cw])).alias("d"),
                F.lit(c).cast("int").alias("c"),
            )
            for c, cw in enumerate(book)
        ]
        best = F.least(*structs) if len(structs) > 1 else structs[0]
        codes.append(best["c"])
    return corpus.select(*cols, F.array(*codes).alias("codes"))


def pq_topk(
    encoded: DataFrame,
    queries: DataFrame,
    books: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: score(q, v) =
    sum_j ||q_j - codeword_{j, codes[v][j]}||^2, ranked ascending.
    The corpus side touches ONLY the codes column (the full vectors
    never rescan); each query's distance lookup is element_at into the
    literal codebooks — a broadcast join of the tiny query set against
    the code table, then one grouped top-k window. Returns
    (query_id, vec_id, adc_dist)."""
    from pyspark.sql import Window

    m = len(books)
    sub = len(books[0][0])
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("qv")
    )
    joined = encoded.join(F.broadcast(q))
    dists = []
    for j, book in enumerate(books):
        qsub = F.slice(F.col("qv"), j * sub + 1, sub)
        # literal array-of-arrays: element_at(book_j, code+1) IS the
        # chosen codeword; distance computed against the query subvector
        book_lit = F.array(*[F.array(*[F.lit(x) for x in cw]) for cw in book])
        cw = F.element_at(book_lit, F.element_at(F.col("codes"), j + 1) + 1)
        dists.append(_sq_l2(qsub, cw))
    total = dists[0]
    for d in dists[1:]:
        total = total + d
    scored = joined.select(
        query_id_col,
        F.col(id_col).alias("vec_id"),
        total.alias("adc_dist"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") <= k)
        .drop("__rn__")
    )


def cosine_pairs_lsh(
    corpus: DataFrame,
    threshold: float = 0.45,
    n_planes: int = 6,
    n_tables: int = 4,
    dim: int | None = None,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Scale-safe embedding-cosine near-dup pairs: multi-table hyperplane
    LSH candidate generation + exact cosine verify.

    Candidates are pairs sharing a bucket in ANY of ``n_tables``
    independent plane sets (recall grows with tables; each miss needs
    all tables to split the pair). The bucket self-join key is
    (table, bucket) — two small ints — so the candidate shuffle carries
    ids only and the wide vectors re-join after the pair dedup. This is
    the 100 TB path; the brute-force all-pairs `a<b` join
    (`e_cosine_pairs`) stays as its small-scale test oracle.

    SIZE ``n_planes`` WITH THE CORPUS: hyperplane buckets hold ~n/2^P
    vectors, so the self-join is O(n^2/2^P) — keep P ≈ log2(n) - 10 so
    buckets stay ~1k at any n (6 planes fits ~64k vectors; a 10^9-vector
    corpus wants ~20). ``max_bucket_size`` (default None) additionally
    anchors oversized buckets to their min-id representative — the
    guard for DUPLICATE-heavy embeddings, where one bucket stays hot no
    matter how many planes; a warning reports anchored buckets."""
    if dim is None:
        raise ValueError("cosine_pairs_lsh requires an explicit embedding dim")
    tables = [hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    bucketed = corpus.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
                    )
                    for t, planes in enumerate(tables)
                ]
            )
        ).alias("tb"),
    ).select("id", "tb.tbl", "tb.bucket")
    anchored = None
    if max_bucket_size is not None:
        # the oversized scan + both join branches re-read bucketed, and
        # its lineage is n_planes*n_tables*dim multiply-adds per vector —
        # cache the narrow (id, tbl, bucket) frame, not the wide vectors
        bucketed = bucketed.persist()
        bucketed, anchored = _anchor_hot_buckets(
            bucketed, ["tbl", "bucket"], max_bucket_size, "cosine_pairs_lsh"
        )
    left = bucketed.select("tbl", "bucket", F.col("id").alias("a"))
    right = bucketed.select("tbl", "bucket", F.col("id").alias("b"))
    cand = left.join(right, ["tbl", "bucket"]).where(
        F.col("a") < F.col("b")
    ).select("a", "b")
    if anchored is not None:
        cand = cand.unionByName(anchored)
    cand = cand.dropDuplicates(["a", "b"])
    # verify is SELECTIVE (expected pairs per corpus row ≪ 1 for a
    # diverse corpus), so norms are evaluated per PAIR, after the
    # candidate join — precomputing them per row below the join would
    # pay one norm for every corpus row to save three per rare pair
    # (measured slower at the shipped parameters); values unchanged
    va = corpus.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    vb = corpus.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    scored = cand.join(va, "a").join(vb, "b").select(
        "a", "b", cosine(F.col("va"), F.col("vb")).alias("score")
    )
    return scored.where(F.col("score") >= threshold)


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

    ``dim`` must be passed explicitly (it is a schema-level fact the
    caller knows); deriving it from the data would need a driver-side
    action on the corpus before planning.
    """
    from pyspark.sql import Window

    if dim is None:
        raise ValueError("lsh_topk requires an explicit embedding dim")
    planes = hyperplanes(dim, n_planes, seed)
    # query-side norms are precomputed (tiny broadcast side — free
    # win); the corpus-side norm is evaluated per PAIR because the
    # bucket join is selective (expected matches per corpus row =
    # |queries| / 2^n_planes, usually ≪ 1): precomputing it per row
    # below the join would cost one norm per corpus row to save one
    # per rare candidate. Values bit-identical either way.
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cvec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            _norm(F.col(vec_col)).alias("qn"),
            lsh_bucket(F.col(vec_col), planes).alias("bucket"),
        )
    )
    scored = c.join(q, "bucket").select(
        "query_id",
        "vec_id",
        (
            _dot(F.col("cvec"), F.col("qvec"))
            / (_norm(F.col("cvec")) * F.col("qn"))
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") <= k)
        .drop("__rn__")
    )
