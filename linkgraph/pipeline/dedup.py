"""Deduplication operators for large-scale text corpora.

All hot paths are JVM-side Catalyst expressions (seeded affine hashes
over Z_p + higher-order array functions — see ``phash.py``; the family
is engine-portable so every operator here has an independent DuckDB
oracle) — no Python in the per-document loop, so the same code runs at
100 TB (the shuffles are on short hash keys, never full texts).

Spiritual parity: the reference's fusing strategies dedup vertices by
business id (/root/reference/builder/core/src/main/java/com/antgroup/openspg/builder/core/strategy/fusing/impl/OverwriteFusing.java);
here we dedup documents by content hash / near-dup signature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.pipeline import phash


def _anchor_hot_buckets(
    bucketed: DataFrame,
    keys: list[str],
    max_bucket_size: int,
    op_name: str,
    carry: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame | None]:
    """Shared hot-bucket guard for the LSH pair generators.

    ``bucketed`` has one row per (*keys, id [, carry...]). Buckets whose
    size exceeds ``max_bucket_size`` are removed from the returned
    ``kept`` frame and replaced by O(size) ``anchored`` candidate pairs
    (every member against the bucket's min-id representative) — a
    template-heavy corpus then costs O(n) instead of O(n^2) per hot
    bucket, and a warning reports the count, never silent. Each ``carry``
    column comes back on the anchored pairs as ``<col>_a`` / ``<col>_b``
    (the a-side / b-side member's value).

    Rows with a NULL bucket key are ignored: equi-joins never match NULL
    keys, so they can neither explode the self-join nor be anchored —
    counting them would fire a misleading warning on e.g. null-text
    extraction failures.

    ``oversized`` is deliberately NOT persisted: it is a cheap
    map-side-combined aggregation over the caller's (cached) signature
    base, and re-computing it in the two join branches beats leaking a
    cached frame for the session's lifetime.
    """
    valid = bucketed
    for k in keys:
        valid = valid.where(F.col(k).isNotNull())
    oversized = (
        valid.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.struct("id", *carry)).alias("m"),
        )
        .where(F.col("n") > max_bucket_size)
        .select(
            *keys,
            F.col("m.id").alias("rep"),
            *[F.col(f"m.{c}").alias(f"_rep_{c}") for c in carry],
        )
    )
    n_over = oversized.count()
    if not n_over:
        return bucketed, None
    import warnings

    warnings.warn(
        f"{op_name}: {n_over} LSH bucket(s) exceed "
        f"max_bucket_size={max_bucket_size} (template- or duplicate-heavy "
        "input) — anchoring members to the bucket representative instead "
        "of self-joining",
        stacklevel=3,
    )
    a_side = F.col("id") < F.col("rep")
    anchored = (
        bucketed.join(oversized, keys)
        .where(F.col("id") != F.col("rep"))
        .select(
            F.least("id", "rep").alias("a"),
            F.greatest("id", "rep").alias("b"),
            *[
                F.when(a_side, F.col(c)).otherwise(F.col(f"_rep_{c}")).alias(f"{c}_a")
                for c in carry
            ],
            *[
                F.when(a_side, F.col(f"_rep_{c}")).otherwise(F.col(c)).alias(f"{c}_b")
                for c in carry
            ],
        )
    )
    kept = bucketed.join(oversized.select(*keys), keys, "left_anti")
    return kept, anchored


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, canonical_id) per doc: canonical = min id sharing the same
    md5(text). Hash-groupBy — shuffles 16-byte digests, not documents."""
    w = Window.partitionBy(F.md5(F.col(text_col)))
    return docs.select(
        F.col(id_col),
        F.min(id_col).over(w).alias("canonical_id"),
    )


def _norm_text(text_col: str) -> F.Column:
    return F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")


def _shingles(text_col: str, k: int = 5) -> F.Column:
    """Character k-shingles of the lowercased, space-normalized text.

    NOTE: project ``_norm_text`` into a real column first and pass that
    column name here — expressions referenced inside a lambda are
    re-evaluated per array element (the regex would run once per
    shingle, ~100× the work)."""
    norm = F.col(text_col)
    n = F.greatest(F.length(norm) - F.lit(k - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n), lambda i: F.substring(norm, i, k)
    )


def minhash_signature(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 7,
) -> DataFrame:
    """(id, sig array<bigint>): sig[i] = min over shingles of
    (a_i * x + b_i) mod P, x = portable polynomial shingle hash
    (phash.char_hash — same family DuckDB reproduces for the oracle).

    Implemented as explode(shingles) + one shingle hash + num_hashes flat
    min-aggregates (then re-packed into an array): flat aggregates stay
    inside whole-stage codegen, ~20× faster than nested higher-order
    array_min(transform(...)) expressions, and the groupBy's map-side
    partial aggregation collapses each doc's shingles before any
    shuffle — at 100 TB the exchange carries ~1 row per document."""
    coeffs = phash.seeded_coeffs(num_hashes, seed)
    normed = docs.select(F.col(id_col), _norm_text(text_col).alias("__norm__"))
    ex = normed.select(
        F.col(id_col), F.explode(_shingles("__norm__", shingle_k)).alias("__sh__")
    )
    # hash the shingle ONCE; each family member is a multiply-add-mod
    xed = ex.select(
        F.col(id_col), phash.char_hash(F.col("__sh__"), shingle_k).alias("__x__")
    )
    aggd = xed.groupBy(id_col).agg(
        *[
            F.min(phash.affine(F.col("__x__"), a, b)).alias(f"__h{i}__")
            for i, (a, b) in enumerate(coeffs)
        ]
    )
    return aggd.select(
        F.col(id_col),
        F.array(*[F.col(f"__h{i}__") for i in range(num_hashes)]).alias("sig"),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.6,
    seed: int = 7,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH, verified by
    estimated Jaccard (fraction of agreeing minhashes).

    shingle -> minhash -> band-hash -> bucket self-join (on the 8-byte
    band key only) -> verify. Returns (a, b, jaccard_est) with a < b.

    Buckets larger than ``max_bucket_size`` are ANCHORED instead of
    self-joined: every member pairs with the bucket's min-id
    representative only — O(size) candidates instead of O(size^2) (a
    10k-doc bucket alone would emit 10^8 pairs, and template-heavy web
    corpora produce exactly such buckets; a warning reports how many
    were anchored, never silent). A clique of near-identical docs still
    collapses — each member verifies against the anchor — while
    unrelated docs sharing one low-information band stop exploding the
    join. Measured on the 100k-page dress rehearsal: the dedup stage
    fell from 511 s (uncapped) to ~200 s. The cap never fires on a
    diverse corpus (the sf0.01/0.1 documents tables are unaffected).
    ``None`` disables the cap."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signature(
        docs, id_col, text_col, num_hashes, shingle_k, seed
    ).persist()
    sigs.count()  # materialize: the self-join below reads it twice
    banded = sigs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        phash.combine(
                            [
                                F.element_at("sig", b * rows_per_band + j + 1)
                                for j in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")

    anchored = None
    if max_bucket_size is not None:
        banded, anchored = _anchor_hot_buckets(
            banded, ["band", "bucket"], max_bucket_size, "minhash_lsh_pairs"
        )

    # candidate generation shuffles only (band, bucket, id) — signatures
    # re-join after the (a, b) dedup, so wide arrays never hit the
    # bucket-join shuffle (matters when one bucket is hot)
    left = banded.select("band", "bucket", F.col("id").alias("a"))
    right = banded.select("band", "bucket", F.col("id").alias("b"))
    cand = (
        left.join(right, ["band", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
    )
    if anchored is not None:
        cand = cand.unionByName(anchored)
    cand = cand.dropDuplicates(["a", "b"])
    sa = sigs.select(F.col(id_col).alias("a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("b"), F.col("sig").alias("sig_b"))
    jacc = cand.join(sa, "a").join(sb, "b").select(
        "a",
        "b",
        (
            F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                    lambda eq: eq,
                )
            )
            / F.lit(float(num_hashes))
        ).alias("jaccard_est"),
    )
    return jacc.where(F.col("jaccard_est") >= jaccard_threshold)


def _bit_value(i: int) -> int:
    """Signed-long value of bit ``i`` (bit 63 is the sign bit)."""
    return -(1 << 63) if i == 63 else 1 << i


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    seed: int = 11,
) -> DataFrame:
    """(id, simhash bigint): sign-aggregated token-hash bits — classic
    Charikar simhash.

    bit_i(token) = (a_i * token_hash + b_i) mod P mod 2 (portable affine
    family, reproducible in the DuckDB oracle). Implemented as
    explode(tokens) + one token hash + ``bits`` flat sum-aggregates:
    map-side combine collapses each doc's tokens before the shuffle, and
    the flat aggs stay in whole-stage codegen (the round-1 nested
    aggregate/zip_with fold evaluated xxhash64 per (token, bit))."""
    assert bits <= 64
    coeffs = phash.seeded_coeffs(bits, seed)
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("__tok__"),
    )
    xed = toks.select(F.col(id_col), phash.token_hash(F.col("__tok__")).alias("__x__"))
    aggd = xed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(phash.affine(F.col("__x__"), a, b) % 2 == 1, 1).otherwise(-1)
            ).alias(f"__c{i}__")
            for i, (a, b) in enumerate(coeffs)
        ]
    )
    # disjoint bit values: plain sum == bitwise OR (bit 63 = -2^63 keeps
    # the total inside signed-64 range in both engines)
    sim = None
    for i in range(bits):
        term = F.when(F.col(f"__c{i}__") > 0, F.lit(_bit_value(i))).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else sim + term
    hashed = aggd.select(F.col(id_col), sim.alias("simhash"))
    # preserve input cardinality: null-text docs produce no tokens (the
    # explode drops them) but must come back with a null hash — callers
    # join simhash output against the corpus by id
    return docs.select(F.col(id_col)).join(hashed, id_col, "left")


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs by simhash hamming distance ≤ ``max_hamming``.

    Pigeonhole LSH: split the 64-bit simhash into ``bands`` chunks — two
    hashes within hamming distance < bands must agree on ≥1 chunk, so
    candidates come from equi-joins on chunk keys (tiny shuffle), then
    exact hamming verifies. Returns (a, b, hamming) with a < b.

    ``bands`` defaults to the smallest power-of-two divisor of 64 that
    exceeds ``max_hamming`` (the pigeonhole requirement).

    Chunk buckets over ``max_bucket_size`` anchor to their min-id
    representative instead of self-joining (same template-corpus
    O(size^2) hazard and mitigation as minhash_lsh_pairs; a warning
    reports how many). UNLIKE minhash, the default is ``None``
    (disabled): the chunk keyspace is only ``2^(64/bands)`` per band
    (16 bits at the default bands=4), so a DIVERSE corpus of n docs
    already averages ``n / 2^width`` docs per bucket of mutually
    dissimilar texts — a fixed cap would fire on every bucket once
    n exceeds ``cap * 2^width`` (~65M at the defaults) and anchor
    unrelated docs to a rep the hamming verify then rejects, silently
    collapsing recall. If you enable the cap on template-heavy input,
    size it ≫ n / 2^(64/bands) (minhash's band key is a ~64-bit hash
    combo, so ITS oversized buckets always mean genuine similarity and
    a fixed default is safe there).
    """
    sims = simhash(docs, id_col, text_col)
    return hamming_pairs(
        sims, id_col=id_col, hash_col="simhash", max_hamming=max_hamming,
        bands=bands, max_bucket_size=max_bucket_size, caller="simhash_pairs",
    )


def hamming_pairs(
    hashed: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
    max_hamming: int = 3,
    bands: int | None = None,
    max_bucket_size: int | None = None,
    caller: str = "hamming_pairs",
    materialize: bool | None = None,
) -> DataFrame:
    """Generic pigeonhole near-dup join over ANY (id, 64-bit hash)
    frame: band the hash into chunks, equi-join on chunk keys, verify by
    exact popcount. Returns (a, b, hamming) with a < b and hamming ≤
    ``max_hamming``. Backs both text simhash and image dhash — NULL
    hashes (null text, undecodable images) are dropped up front, so
    they never form a shared-null bucket.

    ``materialize`` controls whether the verified pair set is eagerly
    localCheckpoint-ed (which lets the cached (id, hash) frame be
    released immediately, but pins the pairs in executor memory/disk
    and is not fault-tolerant). Default ``None`` decides from the input
    size: materialize up to 10M hashed rows; above that the pair set is
    only "small" by assumption (a near-dup-heavy corpus can make it
    huge), so the LAZY frame is returned and the (id, hash) cache is
    released immediately too — each action on the result recomputes the
    hash branches from lineage (fault-tolerant, nothing pinned; callers
    that run several actions should persist the result themselves)."""
    if bands is None:
        bands = next(b for b in (1, 2, 4, 8, 16, 32, 64) if b > max_hamming)
    assert max_hamming < bands and 64 % bands == 0, (
        "pigeonhole needs max_hamming < bands and bands | 64"
    )
    width = 64 // bands
    sims = (
        hashed.select(F.col(id_col).alias("id"), F.col(hash_col).alias("__h__"))
        .where(F.col("__h__").isNotNull())
        .persist()
    )
    n_sims = sims.count()  # materialize: the self-join below reads it twice
    if materialize is None:
        materialize = n_sims <= 10_000_000
    chunked = sims.select(
        "id",
        "__h__",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.call_function("shiftright", F.col("__h__"), b * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("chunk"),
                ),
            )
        ).alias("bc"),
    ).select("id", "__h__", "bc.band", "bc.chunk")
    anchored = None
    if max_bucket_size is not None:
        chunked, anchored = _anchor_hot_buckets(
            chunked, ["band", "chunk"], max_bucket_size, caller,
            carry=("__h__",),
        )
        if anchored is not None:
            anchored = anchored.select(
                "a", "b",
                F.col("__h___a").alias("ha"),
                F.col("__h___b").alias("hb"),
            )

    left = chunked.select("band", "chunk", F.col("id").alias("a"), F.col("__h__").alias("ha"))
    right = chunked.select("band", "chunk", F.col("id").alias("b"), F.col("__h__").alias("hb"))
    cand = left.join(right, ["band", "chunk"]).where(
        F.col("a") < F.col("b")
    ).select("a", "b", "ha", "hb")
    if anchored is not None:
        cand = cand.unionByName(anchored)
    cand = cand.dropDuplicates(["a", "b"])
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    out = cand.select("a", "b", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )
    if materialize:
        # materialize the (bounded-by-gate) verified pair set so the
        # cached (id, hash) frame can be released now instead of
        # leaking for the session lifetime — text/image/audio call
        # sites each invoke this once per corpus
        out = out.localCheckpoint(eager=True)
    # both paths release the cache: the lazy path recomputes the two
    # hash-branch reads from lineage per action instead of pinning
    # |corpus| hashed rows in executor storage with no release handle
    sims.unpersist()
    return out


def ngram_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact word-n-gram Jaccard for given (a, b) pairs — the verify step
    after LSH candidate generation."""
    grams = docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(
                        F.size(F.split(F.trim(F.col(text_col)), r"\s+")) - F.lit(n - 1),
                        F.lit(1),
                    ),
                ),
                lambda i: F.array_join(
                    F.slice(F.split(F.trim(F.col(text_col)), r"\s+"), i, n), " "
                ),
            )
        ).alias("grams"),
    )
    ga = grams.select(F.col("id").alias("a"), F.col("grams").alias("ga"))
    gb = grams.select(F.col("id").alias("b"), F.col("grams").alias("gb"))
    j = pairs.join(ga, "a").join(gb, "b")
    inter = F.size(F.array_intersect("ga", "gb")).cast("double")
    union = F.size(F.array_union("ga", "gb")).cast("double")
    return j.select("a", "b", (inter / union).alias("jaccard"))


def _driver_union_find(spark, pairs: DataFrame) -> DataFrame:
    """Collect a (small) pair frame and resolve clusters with a
    path-halving union-find; returns a broadcastable (__id__, __canon__)
    frame with __canon__ = min member id — the exact contract of the
    distributed kernel. Only called under ``small_pairs_threshold``."""
    from pyspark.sql import types as T

    parent: dict = {}

    def find(x):
        r = parent.setdefault(x, x)
        while r != parent[r]:
            parent[r] = parent[parent[r]]  # path halving
            r = parent[r]
        parent[x] = r
        return r

    for row in pairs.collect():
        ra, rb = find(row["a"]), find(row["b"])
        if ra != rb:
            parent[rb] = ra
    roots: dict = {}
    for x in parent:
        r = find(x)
        m = roots.get(r)
        if m is None or x < m:
            roots[r] = x
    id_type = pairs.schema["a"].dataType
    schema = T.StructType(
        [T.StructField("__id__", id_type), T.StructField("__canon__", id_type)]
    )
    return F.broadcast(
        spark.createDataFrame([(x, roots[find(x)]) for x in parent], schema)
    )


def near_dedup(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_iter: int = 50,
    small_pairs_threshold: int = 1_000_000,
    **lsh_kwargs,
) -> DataFrame:
    """Resolve near-duplicate PAIRS into canonical documents: the
    cluster step every web-scale pipeline runs after candidate
    generation (RefinedWeb/FineWeb-style). Returns one row per input
    doc: (``id_col``, canonical_id) with canonical = the min id of the
    doc's near-dup cluster — keep ``id == canonical_id`` rows to dedup.

    Clusters are the connected components of the pair graph
    (``pairs`` defaults to ``minhash_lsh_pairs(docs, **lsh_kwargs)``,
    but any (a, b) frame works — simhash_pairs, cosine_pairs_lsh).
    Components run on the same exchange-free hash-min Pregel kernel as
    the graph queries (algos.cc — near-dup clusters are shallow, so it
    converges in a handful of supersteps); docs in no pair stay their
    own canonical via one left join. Integral ids feed the kernel
    directly; other id types ride a ``xxhash64`` vid (collision odds
    ~n^2/2^64 — a collision merges two clusters, never drops a doc),
    and the canonical id is re-derived as ``min(id)`` per component so
    the output never exposes hashed vids.

    Spiritual parity: the reference fuses duplicate vertices by
    business-id strategy (OverwriteFusing.java — see module docstring);
    this is the corpus-level analog.
    """
    from pyspark.sql import types as T

    from linkgraph.algos.cc import connected_components

    if pairs is None:
        pairs = minhash_lsh_pairs(docs, id_col=id_col, text_col=text_col, **lsh_kwargs)
    elif lsh_kwargs:
        raise TypeError(
            "near_dedup: LSH parameters have no effect when an explicit "
            f"pairs frame is given: {sorted(lsh_kwargs)}"
        )
    # the pair frame's lineage is the whole LSH candidate join + verify;
    # the CC kernel and the id mapping both re-read it several times
    pairs = pairs.select("a", "b").persist()
    n_pairs = pairs.count()
    if n_pairs <= small_pairs_threshold:
        # small-N fast path: a near-dup pair set that fits the driver
        # does not need a distributed fixed point — one collect plus a
        # union-find gives the identical (id, min-id-of-cluster) output
        # contract without the per-superstep scheduling floor that
        # dominates at demo scale. The 100 TB path (the Pregel kernel
        # below) is untouched; threshold tunable per deployment.
        clusters = _driver_union_find(docs.sparkSession, pairs)
        pairs.unpersist()
        return (
            docs.select(F.col(id_col))
            .join(clusters, F.col(id_col) == F.col("__id__"), "left")
            .select(
                F.col(id_col),
                F.coalesce(F.col("__canon__"), F.col(id_col)).alias("canonical_id"),
            )
        )
    id_type = docs.schema[id_col].dataType
    integral = isinstance(id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType))
    if integral:
        edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        result = connected_components(edges, max_iter=max_iter)
        clusters = result.state.select(
            F.col("vid").alias("__id__"), F.col("component").alias("__canon__")
        )
    else:
        vid = lambda c: F.xxhash64(F.col(c))  # noqa: E731
        edges = pairs.select(vid("a").alias("src"), vid("b").alias("dst"))
        result = connected_components(edges, max_iter=max_iter)
        ids = (
            pairs.select(F.col("a").alias("__id__"))
            .unionByName(pairs.select(F.col("b").alias("__id__")))
            .distinct()
            .select("__id__", F.xxhash64("__id__").alias("vid"))
        )
        clusters = (
            ids.join(result.state, "vid")
            .withColumn("__canon__", F.min("__id__").over(Window.partitionBy("component")))
            .select("__id__", "__canon__")
        )
    if not result.converged:
        import warnings

        warnings.warn(
            f"near_dedup: component labels did not converge within "
            f"max_iter={max_iter} supersteps — a pair-graph chain longer "
            "than that splits one cluster into several canonical ids. "
            "Raise max_iter (cost is one superstep per extra hop).",
            stacklevel=2,
        )
    # materialize the (small) cluster map so the cached pair frame can be
    # released before the lazily-consumed result frame escapes
    clusters = clusters.persist()
    clusters.count()
    pairs.unpersist()
    return (
        docs.select(F.col(id_col))
        .join(clusters, F.col(id_col) == F.col("__id__"), "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("__canon__"), F.col(id_col)).alias("canonical_id"),
        )
    )
