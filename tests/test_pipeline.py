"""Training-data pipeline ops: dedup, similarity search, text stats,
multimodal plumbing."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkgraph.pipeline import dedup, multimodal, simsearch, textstats


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest where tall trees grow for many years"
    )
    near = base.replace("quick", "swift").replace("lazy", "sleepy")
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, near),  # near dup of 0
        (3, "completely different text about spark dataframes and shuffle joins"),
        (4, "der hund und die katze sind nicht mit der maus zu ein haus"),
        (5, "el perro y la gata es un animal que vive en la casa con amor"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_dedup(docs):
    got = {r["doc_id"]: r["canonical_id"] for r in dedup.exact_dedup(docs).collect()}
    assert got[0] == 0 and got[1] == 0  # dup group collapses to min id
    assert all(got[i] == i for i in (2, 3, 4, 5))


def test_minhash_lsh_finds_near_dups(docs):
    pairs = dedup.minhash_lsh_pairs(docs, jaccard_threshold=0.5)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert (0, 1) in got  # exact dup: jaccard 1.0
    assert (0, 2) in got or (1, 2) in got  # near dup caught
    assert all({a, b} != {3, 4} for a, b in got)


def test_minhash_signature_deterministic(docs):
    s1 = dedup.minhash_signature(docs).collect()
    s2 = dedup.minhash_signature(docs).collect()
    assert {r["doc_id"]: r["sig"] for r in s1} == {r["doc_id"]: r["sig"] for r in s2}


def test_simhash_near_for_near_dups(docs):
    got = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert got[0] == got[1]

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(got[0], got[2]) < hamming(got[0], got[3])


def test_ngram_jaccard(spark, docs):
    pairs = spark.createDataFrame([(0, 1), (0, 3)], "a bigint, b bigint")
    got = {(r["a"], r["b"]): r["jaccard"] for r in dedup.ngram_jaccard(docs, pairs).collect()}
    assert got[(0, 1)] == 1.0
    assert got[(0, 3)] < 0.1


def test_text_stats(docs):
    got = {r["doc_id"]: r for r in textstats.text_stats(docs).collect()}
    assert got[0]["n_tokens"] == 25
    assert got[0]["stopword_ratio"] > 0.1  # 'the' x3 + 'and' + 'for'
    assert 0.0 <= got[0]["quality_score"] <= 1.0


def test_lang_id(docs):
    got = {r["doc_id"]: r["pred_lang"] for r in textstats.lang_id(docs).collect()}
    assert got[0] == "en"
    assert got[4] == "de"
    assert got[5] == "es"


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [(0, "Hello  World"), (1, "hello world"), (2, "other")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["fp"] for r in textstats.fingerprint(df).collect()}
    assert got[0] == got[1] != got[2]


@pytest.fixture(scope="module")
def vectors(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.standard_normal(16)
    rows = []
    for i in range(50):
        if i < 5:  # cluster near base
            v = base + 0.05 * rng.standard_normal(16)
        else:
            v = rng.standard_normal(16)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_brute_force_topk(vectors):
    q = vectors.where(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), F.col("embedding")
    )
    got = simsearch.brute_force_topk(vectors, q, k=5)
    rows = got.orderBy(F.col("score").desc()).collect()
    ids = [r["vec_id"] for r in rows]
    assert ids[0] == 0 and rows[0]["score"] == pytest.approx(1.0)
    assert set(ids) == {0, 1, 2, 3, 4}  # the planted cluster


def test_lsh_topk_overlaps_brute_force(vectors):
    q = vectors.where(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), F.col("embedding")
    )
    brute = {r["vec_id"] for r in simsearch.brute_force_topk(vectors, q, k=5).collect()}
    approx = {r["vec_id"] for r in simsearch.lsh_topk(vectors, q, k=5, n_planes=4, dim=16).collect()}
    # same-cluster vectors land in the query's bucket with high prob
    assert 0 in approx
    assert len(brute & approx) >= 3


def test_ivf_topk_overlaps_brute_force(vectors):
    q = vectors.where(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), F.col("embedding")
    )
    brute = {r["vec_id"] for r in simsearch.brute_force_topk(vectors, q, k=5).collect()}
    ivf = {
        r["vec_id"]
        for r in simsearch.ivf_topk(vectors, q, k=5, n_centroids=8, n_probe=3).collect()
    }
    assert 0 in ivf
    assert len(brute & ivf) >= 3


def test_pq_encode_and_adc_topk(vectors):
    """Product quantization: codes are valid indices, a codeword-exact
    vector encodes to distance ~0 against itself, and ADC top-k ranks
    the planted near-cluster ahead of random vectors."""
    books = simsearch.pq_codebooks(vectors, m_subspaces=4, n_codes=8)
    assert len(books) == 4 and all(len(b) == 8 for b in books)
    assert all(len(cw) == 4 for b in books for cw in b)
    enc = simsearch.pq_encode(vectors, books)
    rows = {r["vec_id"]: r["codes"] for r in enc.collect()}
    assert len(rows) == 50
    assert all(len(c) == 4 and all(0 <= x < 8 for x in c) for c in rows.values())
    # a query that IS a sampled codebook vector: its ADC self-distance is
    # the quantization floor — strictly below a far random vector's
    q = vectors.where(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), F.col("embedding")
    )
    top = simsearch.pq_topk(enc, q, books, k=10).collect()
    assert len(top) == 10
    ids = [r["vec_id"] for r in top]
    dists = [r["adc_dist"] for r in top]
    assert dists == sorted(dists)
    # the planted cluster {0..4} quantizes to (near-)identical codes, so
    # ADC puts a majority of it in the top-10
    assert len(set(ids) & {0, 1, 2, 3, 4}) >= 3
    # deterministic across invocations (seeded sampling, no RNG at query)
    top2 = simsearch.pq_topk(simsearch.pq_encode(vectors, books), q, books, k=10).collect()
    assert [(r["vec_id"], r["adc_dist"]) for r in top2] == [
        (r["vec_id"], r["adc_dist"]) for r in top
    ]


def test_pq_encode_is_projection_only(vectors):
    """The encode plan must be a pure projection over the scan — no
    Exchange, no Python UDF (the 10^12-vector encode pass is
    embarrassingly parallel)."""
    import contextlib
    import io

    books = simsearch.pq_codebooks(vectors, m_subspaces=4, n_codes=8)
    enc = simsearch.pq_encode(vectors, books)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        enc.explain(mode="formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan  # no Batch/ArrowEvalPython nodes


def test_multimodal_fake_decode(spark):
    rows = [
        (i, multimodal.encode_fake_image(8 + i, 6, 3, seed=i)) for i in range(4)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "image"]), "id bigint, image binary"
    )
    got = {r["id"]: r for r in multimodal.image_metadata(df).collect()}
    assert got[2]["width"] == 10 and got[2]["height"] == 6 and got[2]["channels"] == 3
    assert got[2]["n_bytes"] == len(rows[2][1])
    assert 0 < got[2]["mean_value"] < 255


def test_multimodal_stub_raises(spark):
    df = spark.createDataFrame([(1, b"notanimage")], "id bigint, image binary")
    with pytest.raises(Exception, match="NotImplementedError|FAKEIMG|codec|Pillow"):
        multimodal.image_metadata(df).collect()


def test_simhash_pairs(docs):
    got = {(r["a"], r["b"]): r["hamming"] for r in dedup.simhash_pairs(docs, max_hamming=3).collect()}
    assert got.get((0, 1)) == 0  # exact dup
    # near dup (0,2) may or may not be <=3 hamming; exact dup must be only 0-distance pair
    assert all(h <= 3 for h in got.values())


def test_lsh_topk_requires_dim(vectors):
    q = vectors.where(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), F.col("embedding")
    )
    with pytest.raises(ValueError):
        simsearch.lsh_topk(vectors, q, k=5, n_planes=4)


def test_ivf_kmeans_refine_improves_or_matches(vectors):
    """Lloyd refinement keeps (usually improves) recall vs the seeded
    sample, and stays deterministic run-to-run."""
    q = vectors.where(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), F.col("embedding")
    )
    brute = {r["vec_id"] for r in simsearch.brute_force_topk(vectors, q, k=5).collect()}
    km1 = {
        r["vec_id"]
        for r in simsearch.ivf_topk(
            vectors, q, k=5, n_centroids=8, n_probe=3, kmeans_iters=2
        ).collect()
    }
    km2 = {
        r["vec_id"]
        for r in simsearch.ivf_topk(
            vectors, q, k=5, n_centroids=8, n_probe=3, kmeans_iters=2
        ).collect()
    }
    assert km1 == km2  # deterministic
    assert 0 in km1
    assert len(brute & km1) >= 3


def test_cosine_pairs_lsh_finds_planted_cluster(vectors):
    """Genuinely-near pairs (the planted cos≈0.99 cluster, ids 0-4) all
    survive multi-table LSH; precision is exact by construction (every
    emitted pair passes the exact cosine verify)."""
    got = simsearch.cosine_pairs_lsh(
        vectors, threshold=0.9, n_planes=6, n_tables=4, dim=16
    ).collect()
    pairs = {(r["a"], r["b"]) for r in got}
    expected = {(a, b) for a in range(5) for b in range(a + 1, 5)}
    assert expected <= pairs
    # verify step is exact: every reported score really is >= threshold
    brute = {
        (r["a"], r["b"])
        for r in vectors.alias("x")
        .join(vectors.alias("y"), F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("a"),
            F.col("y.vec_id").alias("b"),
            simsearch.cosine(F.col("x.embedding"), F.col("y.embedding")).alias("s"),
        )
        .where(F.col("s") >= 0.9)
        .collect()
    }
    assert pairs <= brute


def test_near_dedup_resolves_clusters(spark, docs):
    """Pairs -> connected components -> canonical: the transitive
    cluster {0,1,2} collapses to min id 0; singletons keep themselves;
    every input doc gets exactly one row."""
    got = {r["doc_id"]: r["canonical_id"] for r in
           dedup.near_dedup(docs, jaccard_threshold=0.5).collect()}
    assert got[0] == got[1] == got[2] == 0  # near-dup 2 clusters via LSH
    assert all(got[i] == i for i in (3, 4, 5))
    assert len(got) == 6

    # explicit pairs + LSH params is a contradiction — reject loudly
    with pytest.raises(TypeError, match="no effect"):
        dedup.near_dedup(
            docs,
            pairs=spark.createDataFrame([(0, 1)], "a bigint, b bigint"),
            jaccard_threshold=0.9,
        )

    # transitivity through explicit pairs (0-1, 1-2 only — no 0-2 pair)
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "a bigint, b bigint")
    got = {r["doc_id"]: r["canonical_id"] for r in
           dedup.near_dedup(docs, pairs=pairs).collect()}
    assert got[0] == got[1] == got[2] == 0 and got[3] == 3
    # the distributed Pregel kernel (threshold 0 forces it) returns the
    # identical contract as the driver union-find fast path above
    got_dist = {r["doc_id"]: r["canonical_id"] for r in
                dedup.near_dedup(docs, pairs=pairs,
                                 small_pairs_threshold=0).collect()}
    assert got_dist == got

    # non-integral ids ride the hashed-vid path; canonical is still min ID
    sdocs = docs.select(
        F.concat(F.lit("url-"), F.col("doc_id").cast("string")).alias("doc_id"),
        "text",
    )
    got = {r["doc_id"]: r["canonical_id"] for r in
           dedup.near_dedup(sdocs, jaccard_threshold=0.5).collect()}
    assert got["url-0"] == got["url-1"] == "url-0"
    assert got["url-3"] == "url-3"
    # hashed-vid distributed path agrees with the string fast path too
    got_dist = {r["doc_id"]: r["canonical_id"] for r in
                dedup.near_dedup(sdocs, jaccard_threshold=0.5,
                                 small_pairs_threshold=0).collect()}
    assert got_dist == got


def test_hot_bucket_cap_ignores_null_keys(spark):
    """Null-signature docs (extraction failures) share a NULL bucket key
    but NULL keys never equi-join — the cap must not count them as an
    oversized bucket (no warning) and must not anchor them."""
    import warnings

    from linkgraph.pipeline.dedup import simhash_pairs

    rows = [(f"n{i}", None) for i in range(20)]  # null texts
    rows += [("a1", "some perfectly ordinary document text here"),
             ("a2", "some perfectly ordinary document text here")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        pairs = {(r["a"], r["b"]) for r in
                 simhash_pairs(docs, max_bucket_size=5).collect()}
    assert not any("anchoring" in str(w.message) for w in caught)
    assert pairs == {("a1", "a2")}


def test_cosine_pairs_lsh_hot_bucket_anchoring(spark):
    """Duplicate-heavy embeddings (one vector repeated many times) keep a
    bucket hot no matter how many hyperplanes: max_bucket_size anchors the
    bucket to its min-id representative, the warning fires, every anchored
    pair still passes the exact cosine verify, and unrelated vectors never
    pair."""
    import warnings

    import numpy as np

    rng = np.random.default_rng(23)
    base = rng.standard_normal(16)
    rows = [(i, [float(x) for x in base + 1e-4 * rng.standard_normal(16)])
            for i in range(30)]  # near-identical clique
    rows += [(100 + j, [float(x) for x in rng.standard_normal(16)])
             for j in range(5)]  # unrelated
    vecs = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        capped = {(r["a"], r["b"]) for r in simsearch.cosine_pairs_lsh(
            vecs, threshold=0.95, n_planes=6, n_tables=4, dim=16,
            max_bucket_size=8,
        ).collect()}
    assert any("anchoring" in str(w.message) for w in caught)
    # the clique collapses through its min-id anchor (0), linearly not O(n^2)
    anchored_to_0 = {b for a, b in capped if a == 0}
    assert len(anchored_to_0) >= 25
    # exact verify still gates every emitted pair
    full = {(r["a"], r["b"]) for r in simsearch.cosine_pairs_lsh(
        vecs, threshold=0.95, n_planes=6, n_tables=4, dim=16,
    ).collect()}
    assert capped <= full
    assert not any(a >= 100 or b >= 100 for a, b in capped)


def test_audio_stats_real_wav(spark):
    """The audio path is a REAL decoder (stdlib wave): synthesize PCM
    WAVs with known properties and verify duration/RMS/peak."""
    import io
    import math
    import wave

    import numpy as np

    from linkgraph.pipeline import multimodal

    def make_wav(freq, seconds, rate=8000, amp=0.5):
        t = np.arange(int(rate * seconds)) / rate
        pcm = (amp * np.sin(2 * math.pi * freq * t) * 32767).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(pcm.tobytes())
        return buf.getvalue()

    rows = [(1, make_wav(440, 0.5)), (2, make_wav(220, 2.0, amp=0.25))]
    df = spark.createDataFrame(rows, "id bigint, audio binary")
    got = {r["id"]: r for r in multimodal.audio_stats(df).collect()}
    assert got[1]["sample_rate"] == 8000 and got[1]["n_channels"] == 1
    assert abs(got[1]["duration_s"] - 0.5) < 1e-9
    assert abs(got[2]["duration_s"] - 2.0) < 1e-9
    # sine RMS = amp/sqrt(2)
    assert abs(got[1]["rms"] - 0.5 / math.sqrt(2)) < 0.01
    assert abs(got[2]["rms"] - 0.25 / math.sqrt(2)) < 0.01
    assert got[1]["peak"] <= 0.5 + 0.01 and got[2]["peak"] <= 0.25 + 0.01


def test_audio_aiff_decode_cross_container():
    """AIFF (big-endian PCM, 80-bit-float sample rate) decodes through
    the same kernel as WAV: identical stats for the same signal, and a
    0-bit fingerprint distance across containers."""
    import io
    import struct
    import wave

    import numpy as np

    from linkgraph.pipeline import audiofp, multimodal

    def make_wav(sig, rate=8000):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes((sig * 32767).astype("<i2").tobytes())
        return buf.getvalue()

    def make_aiff(sig, rate=8000):
        pcm = (sig * 32767).astype(">i2").tobytes()
        exp, mant = 16383 + 63, rate
        while mant < (1 << 63):
            mant <<= 1
            exp -= 1
        ext = bytes([(exp >> 8) & 0x7F, exp & 0xFF]) + mant.to_bytes(8, "big")
        comm = struct.pack(">HIH", 1, sig.size, 16) + ext
        ssnd = struct.pack(">II", 0, 0) + pcm

        def chunk(tag, d):
            return tag + struct.pack(">I", len(d)) + d + (b"\x00" if len(d) & 1 else b"")

        body = b"AIFF" + chunk(b"COMM", comm) + chunk(b"SSND", ssnd)
        return b"FORM" + struct.pack(">I", len(body)) + body

    t = np.arange(16000) / 8000.0
    sig = (0.6 * np.sin(2 * np.pi * (200 + 150 * t) * t)
           * (0.5 + 0.5 * np.sin(2 * np.pi * 1.3 * t)))
    wv, af = make_wav(sig), make_aiff(sig)
    sw, sa = multimodal.decode_wav_bytes(wv), multimodal.decode_wav_bytes(af)
    assert (sa["sample_rate"], sa["n_channels"], sa["n_frames"]) == (8000, 1, 16000)
    assert abs(sw["rms"] - sa["rms"]) < 1e-9 and abs(sw["peak"] - sa["peak"]) < 1e-9
    hw = audiofp.audio_fingerprint_bytes(wv)
    ha = audiofp.audio_fingerprint_bytes(af)
    assert bin(hw ^ ha).count("1") == 0

    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="compression"):
        comm22 = struct.pack(">HIH", 1, 4, 16) + b"\x40\x0c" + b"\x00" * 8 + b"ulaw"
        body = (b"AIFC"
                + b"COMM" + struct.pack(">I", 22) + comm22
                + b"SSND" + struct.pack(">I", 8) + struct.pack(">II", 0, 0))
        multimodal.pcm_samples(b"FORM" + struct.pack(">I", len(body)) + body)


def test_audio_fingerprint_and_neardup_pairs(spark):
    """Spectral-delta fingerprint: the same clip as 16-bit vs 8-bit PCM
    or volume-scaled hashes within a few bits (frame-to-frame band
    comparisons are gain-invariant); different material is far; the
    pair generator reuses the pigeonhole machinery and null-pads
    undecodable blobs."""
    import io
    import wave

    import numpy as np

    from linkgraph.pipeline import audiofp

    def make_wav(sig, width=2, rate=8000):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(width)
            w.setframerate(rate)
            if width == 2:
                w.writeframes((sig * 32767).astype("<i2").tobytes())
            else:
                w.writeframes(
                    ((sig * 127) + 128).clip(0, 255).astype(np.uint8).tobytes()
                )
        return buf.getvalue()

    def ham(a, b):
        return bin(a ^ b).count("1")

    t = np.arange(16000) / 8000.0
    sig = (0.6 * np.sin(2 * np.pi * (200 + 150 * t) * t)
           * (0.5 + 0.5 * np.sin(2 * np.pi * 1.3 * t)))
    other = (0.5 * np.sin(2 * np.pi * (700 - 300 * t) * t)
             * (0.5 + 0.5 * np.cos(2 * np.pi * 0.7 * t)))
    h16 = audiofp.audio_fingerprint_bytes(make_wav(sig))
    assert ham(h16, audiofp.audio_fingerprint_bytes(make_wav(sig, width=1))) <= 4
    assert ham(h16, audiofp.audio_fingerprint_bytes(make_wav(sig * 0.3))) <= 4
    assert ham(h16, audiofp.audio_fingerprint_bytes(make_wav(other))) > 12

    rows = [
        (1, bytearray(make_wav(sig))),
        (2, bytearray(make_wav(sig, width=1))),
        (3, bytearray(make_wav(other))),
        (4, bytearray(b"RIFFnot-a-wav")),
    ]
    df = spark.createDataFrame(rows, "id bigint, audio binary")
    pairs = audiofp.audio_neardup_pairs(df, max_hamming=6).collect()
    assert {(r["a"], r["b"]) for r in pairs} == {(1, 2)}
    fps = {r["id"]: r["afp"] for r in
           audiofp.audio_fingerprint(df, on_error="null").collect()}
    assert fps[4] is None and fps[1] is not None


def test_image_metadata_real_bmp(spark):
    """Uncompressed BMP is decoded for real (pure header math)."""
    import struct

    import numpy as np

    from linkgraph.pipeline import multimodal

    def make_bmp(w, h, value):
        c = 3
        stride = (w * c + 3) & ~3
        px_size = stride * h
        header = b"BM" + struct.pack("<IHHI", 54 + px_size, 0, 0, 54)
        info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, px_size, 2835, 2835, 0, 0)
        row = bytes([value] * (w * c)) + b"\x00" * (stride - w * c)
        return header + info + row * h

    rows = [(1, make_bmp(5, 4, 100)), (2, make_bmp(3, 3, 200))]
    df = spark.createDataFrame(rows, "id bigint, image binary")
    got = {r["id"]: r for r in multimodal.image_metadata(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (5, 4, 3)
    assert got[1]["mean_value"] == 100.0  # padding excluded from the mean
    assert (got[2]["width"], got[2]["height"]) == (3, 3)
    assert got[2]["mean_value"] == 200.0


def test_multimodal_on_error_null(spark):
    from linkgraph.pipeline import multimodal

    good = multimodal.encode_fake_image(2, 2, 1, seed=3)
    corrupt_bmp = b"BM" + b"\x00" * 60  # claims nothing valid
    df = spark.createDataFrame(
        [(1, good), (2, corrupt_bmp), (3, b"\x89PNG....")],
        "id bigint, image binary",
    )
    rows = {r["id"]: r for r in multimodal.image_metadata(df, on_error="null").collect()}
    assert rows[1]["width"] == 2 and rows[2]["width"] is None and rows[3]["width"] is None
    import pytest

    with pytest.raises(Exception):
        multimodal.image_metadata(df).collect()  # default raises

    adf = spark.createDataFrame([(1, b"RIFFnotawav")], "id bigint, audio binary")
    arows = multimodal.audio_stats(adf, on_error="null").collect()
    assert arows[0]["sample_rate"] is None


def test_simhash_preserves_null_text_rows(spark):
    from linkgraph.pipeline import dedup

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, None)], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert set(got) == {1, 2} and got[1] is not None and got[2] is None


def test_quality_filter_rules(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog walked to the house in the morning sun"),
            (2, "short text"),
            (3, "the " * 12 + "!!!???!!!***%%%$$$###@@@!!!???***"),
            (4, "word1 word2 word3 word4 word5 word6 word7 word8 word9 word10 word11"),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: (r["keep"], r["reject_reason"]) for r in textstats.quality_filter(docs).collect()}
    assert got[1] == (True, "ok")
    assert got[2] == (False, "too_short")
    assert got[3][0] is False and got[3][1] in ("punct_noise", "digit_noise")
    assert got[4] == (False, "no_stopwords")  # no english stopwords


def test_host_graph_rollup(spark):
    from linkgraph.normalize import host_graph

    e = spark.createDataFrame(
        [
            ("https://a.com/x", "https://b.com/y", "t"),
            ("https://a.com/z", "https://b.com/w", "t"),
            ("https://a.com/q", "https://a.com/r", "t"),  # self-host drops
            ("https://b.com/1", "https://c.org/2", "t"),
        ],
        "src_url string, dst_url string, anchor string",
    )
    got = {(r["src_host"], r["dst_host"]): r["weight"] for r in host_graph(e).collect()}
    assert got == {("a.com", "b.com"): 2, ("b.com", "c.org"): 1}


def test_quality_filter_null_text(spark):
    from linkgraph.pipeline import textstats as ts

    docs = spark.createDataFrame(
        [(1, "the cat and the dog walked to the house in the morning"), (2, None)],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: (r["keep"], r["reject_reason"]) for r in ts.quality_filter(docs).collect()}
    assert got[1] == (True, "ok") and got[2] == (False, "no_text")


def test_host_graph_drops_malformed_urls(spark):
    from linkgraph.normalize import host_graph

    e = spark.createDataFrame(
        [("/relative", "https://b.com/x", "t"), ("https://a.com/1", "https://b.com/2", "t")],
        "src_url string, dst_url string, anchor string",
    )
    got = {(r["src_host"], r["dst_host"]) for r in host_graph(e).collect()}
    assert got == {("a.com", "b.com")}


def test_chunk_documents(spark):
    from linkgraph.pipeline import textstats as ts

    text = " ".join(f"t{i}" for i in range(10))
    docs = spark.createDataFrame([(1, text), (2, "a b")], "doc_id bigint, text string")
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_tokens"])
        for r in ts.chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    )
    # doc 1: step 3 -> chunks [0..3],[3..6],[6..9],[9]
    assert got == [
        (1, 0, "t0 t1 t2 t3", 4),
        (1, 1, "t3 t4 t5 t6", 4),
        (1, 2, "t6 t7 t8 t9", 4),
        (2, 0, "a b", 2),
    ]
    import pytest

    with pytest.raises(ValueError):
        ts.chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_line_dedup_boilerplate(spark):
    from linkgraph.pipeline import textstats as ts

    nav = "home | about | contact"
    docs = spark.createDataFrame(
        [
            (1, f"{nav}\nunique content one\nfooter"),
            (2, f"{nav}\nother unique text\nfooter"),
            (3, f"{nav}\nfooter"),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["text"] for r in ts.line_dedup(docs).collect()}
    # nav + footer appear in >1 doc -> dropped; order of surviving lines kept
    assert got == {
        1: "unique content one",
        2: "other unique text",
        3: "",  # fully boilerplate, row preserved
    }


def test_image_metadata_real_png(spark):
    """Real 8-bit PNG decode via stdlib zlib: round-trips our filter-0
    writer, and the unfilter path reconstructs Sub/Up/Average/Paeth rows
    (a reference PNG built by filtering known pixels forward)."""
    import struct
    import zlib

    import numpy as np

    from linkgraph.pipeline import multimodal

    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, size=(3, 7), dtype=np.uint8)
    blob_rgb = multimodal.encode_png(rgb)
    blob_gray = multimodal.encode_png(gray)
    df = spark.createDataFrame(
        [(1, bytearray(blob_rgb)), (2, bytearray(blob_gray))],
        "id bigint, image binary",
    )
    got = {r["id"]: r for r in multimodal.image_metadata(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (5, 4, 3)
    assert abs(got[1]["mean_value"] - float(rgb.mean())) < 1e-9
    assert (got[2]["width"], got[2]["height"], got[2]["channels"]) == (7, 3, 1)
    assert abs(got[2]["mean_value"] - float(gray.mean())) < 1e-9

    # forward-filter known pixels with each filter type, then decode
    px = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)  # gray w=6
    c, stride = 1, 6
    lines = []
    prev = np.zeros(stride, dtype=np.int64)
    for r, ftype in enumerate([1, 2, 3, 4]):
        cur = px[r].astype(np.int64)
        filt = np.zeros(stride, dtype=np.int64)
        for x in range(stride):
            a = cur[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if ftype == 1:
                filt[x] = (cur[x] - a) % 256
            elif ftype == 2:
                filt[x] = (cur[x] - b) % 256
            elif ftype == 3:
                filt[x] = (cur[x] - (a + b) // 2) % 256
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                filt[x] = (cur[x] - pred) % 256
        lines.append(bytes([ftype]) + bytes(filt.astype(np.uint8)))
        prev = cur
    scan = b"".join(lines)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 6, 4, 8, 0, 0, 0, 0)
    blob = (multimodal.PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))
    meta = multimodal.decode_image_bytes(blob)
    assert abs(meta["mean_value"] - float(px.mean())) < 1e-9

    # 16-bit gray decodes for real now (big-endian samples, spec §7.1)
    vals16 = np.array([[0, 65535], [256, 512]], dtype=np.uint16)
    raw16 = b"".join(b"\x00" + vals16[r].astype(">u2").tobytes() for r in range(2))
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    blob16 = (multimodal.PNG_MAGIC + chunk(b"IHDR", ihdr16)
              + chunk(b"IDAT", zlib.compress(raw16)) + chunk(b"IEND", b""))
    meta16 = multimodal.decode_image_bytes(blob16)
    assert (meta16["width"], meta16["height"], meta16["channels"]) == (2, 2, 1)
    assert abs(meta16["mean_value"] - float(vals16.mean())) < 1e-9


def test_png_palette_subbyte_and_adam7():
    """The PNG decoder covers every legal IHDR: 4-bit palette images map
    through PLTE to RGB, 1-bit gray unpacks MSB-first, and an Adam7
    stream scatters its seven passes back to the right pixels."""
    import struct
    import zlib

    import numpy as np

    from linkgraph.pipeline import multimodal

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    def png(ihdr_fields, raw, plte=None):
        out = multimodal.PNG_MAGIC + chunk(b"IHDR", struct.pack(">IIBBBBB", *ihdr_fields))
        if plte is not None:
            out += chunk(b"PLTE", plte)
        return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")

    # 4-bit palette, 3x2: indices 0..5 packed two per byte, MSB-first
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                    [10, 20, 30], [40, 50, 60], [70, 80, 90]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [3, 4, 5]], dtype=np.uint8)
    rows = []
    for r in range(2):
        packed = bytes([idx[r, 0] << 4 | idx[r, 1], idx[r, 2] << 4])
        rows.append(b"\x00" + packed)
    meta = multimodal.decode_image_bytes(
        png((3, 2, 4, 3, 0, 0, 0), b"".join(rows), plte=pal.tobytes()))
    assert (meta["width"], meta["height"], meta["channels"]) == (3, 2, 3)
    assert abs(meta["mean_value"] - float(pal[idx].mean())) < 1e-9

    # 1-bit gray, 10x2 (stride crosses a byte boundary)
    bits = np.array([[1, 0, 1, 0, 1, 0, 1, 0, 1, 0],
                     [0, 0, 0, 0, 1, 1, 1, 1, 0, 1]], dtype=np.uint8)
    raw1 = b"".join(
        b"\x00" + np.packbits(bits[r]).tobytes() for r in range(2))
    meta1 = multimodal.decode_image_bytes(png((10, 2, 1, 0, 0, 0, 0), raw1))
    assert (meta1["width"], meta1["height"]) == (10, 2)
    assert abs(meta1["mean_value"] - float(bits.mean())) < 1e-9

    # Adam7 interlaced 8-bit gray 4x4: forward-scatter known pixels into
    # the seven passes, then expect the decoder to reassemble them
    px = np.arange(16, dtype=np.uint8).reshape(4, 4)
    passes = []
    for x0, y0, dx, dy in multimodal._ADAM7:
        sub = px[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        passes.append(b"".join(b"\x00" + sub[r].tobytes() for r in range(sub.shape[0])))
    meta7 = multimodal.decode_image_bytes(png((4, 4, 8, 0, 0, 0, 1), b"".join(passes)))
    assert abs(meta7["mean_value"] - float(px.mean())) < 1e-9


def test_repetition_stats(spark):
    """Gopher-style duplicate-n-gram fractions: a looping doc scores
    high, a diverse doc scores 0, NULL text yields zeros (cardinality
    preserved)."""
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "all words here are different"),
            (3, None),
            (4, "one"),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in textstats.repetition_stats(docs).collect()}
    assert set(got) == {1, 2, 3, 4}
    r1 = got[1]
    assert r1["n_words"] == 4
    assert r1["dup_word_frac"] == 0.75          # 4 words, 1 distinct
    assert r1["n_2grams"] == 3
    assert r1["dup_2gram_frac"] == 0.6666       # 3 grams, 1 distinct (floor r4)
    assert r1["max_2gram_frac"] == 1.0          # 'spam spam' is every gram
    r2 = got[2]
    assert r2["dup_word_frac"] == 0.0 and r2["dup_2gram_frac"] == 0.0
    assert r2["max_2gram_frac"] == 0.25         # 4 grams, each once
    r3 = got[3]
    assert r3["n_words"] == 0 and r3["max_2gram_frac"] == 0.0
    r4_ = got[4]
    assert r4_["n_words"] == 1 and r4_["n_2grams"] == 0
    assert r4_["max_2gram_frac"] == 0.0


def test_image_metadata_real_jpeg(spark):
    """Real baseline JPEG decode (T.81 Huffman + IDCT): round-trips the
    near-lossless all-ones-quant encoder in gray, RGB 4:4:4, 4:2:0
    (exercises chroma upsample) and with restart markers."""
    import numpy as np

    from linkgraph.pipeline import jpeg, multimodal

    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, size=(13, 21), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(17, 19, 3), dtype=np.uint8)
    flat = np.repeat(
        rng.integers(0, 256, size=(20, 28, 1), dtype=np.uint8), 3, axis=2
    )  # chroma-flat so 4:2:0 subsampling loses nothing
    rows = [
        (1, bytearray(jpeg.encode_jpeg(g))),
        (2, bytearray(jpeg.encode_jpeg(rgb))),
        (3, bytearray(jpeg.encode_jpeg(flat, subsampling="420"))),
        (4, bytearray(jpeg.encode_jpeg(rgb, restart_interval=2))),
    ]
    df = spark.createDataFrame(rows, "id bigint, image binary")
    got = {r["id"]: r for r in multimodal.image_metadata(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (21, 13, 1)
    assert abs(got[1]["mean_value"] - float(g.mean())) < 0.5
    assert (got[2]["width"], got[2]["height"], got[2]["channels"]) == (19, 17, 3)
    assert abs(got[2]["mean_value"] - float(rgb.mean())) < 1.0
    assert (got[3]["width"], got[3]["height"]) == (28, 20)
    assert abs(got[3]["mean_value"] - float(flat.mean())) < 1.0
    assert abs(got[4]["mean_value"] - got[2]["mean_value"]) < 0.5


def test_jpeg_progressive_roundtrip():
    """Progressive (SOF2) decode: spectral-selection and
    successive-approximation scan scripts reconstruct bit-identically
    to the baseline decode of the same image (identical quantized
    coefficients, identical IDCT), across restart intervals and band
    splits."""
    import numpy as np

    from linkgraph.pipeline import jpeg

    rng = np.random.default_rng(7)
    g = rng.integers(0, 256, size=(13, 21), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(17, 19, 3), dtype=np.uint8)
    for img in (g, rgb):
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(img))
        for kw in (
            {},
            {"successive": True},
            {"restart_interval": 2},
            {"successive": True, "restart_interval": 2},
            {"successive": True, "bands": ((1, 1), (2, 9), (10, 63))},
        ):
            got = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img, **kw))
            assert np.array_equal(got, base), kw
        assert np.abs(base.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_progressive_420_smooth_and_corrupt():
    """4:2:0 progressive (subsampled own-grid AC scans vs MCU-grid DC
    scan), long EOB runs on a smooth gradient (exact reconstruction),
    and clean rejection of truncated/invalid scan scripts."""
    import numpy as np
    import pytest as _pytest

    from linkgraph.pipeline import jpeg

    rng = np.random.default_rng(11)
    flat = np.repeat(
        rng.integers(0, 256, size=(20, 28, 1), dtype=np.uint8), 3, axis=2
    )
    for kw in ({}, {"successive": True}):
        got = jpeg.decode_jpeg(
            jpeg.encode_jpeg_progressive(flat, subsampling="420", **kw)
        )
        assert np.abs(got.astype(int) - flat.astype(int)).max() <= 1

    smooth = (np.add.outer(np.arange(120), np.arange(200)) % 256).astype(np.uint8)
    for kw in ({}, {"successive": True}, {"successive": True, "restart_interval": 3}):
        got = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(smooth, **kw))
        assert np.array_equal(got, smooth), kw

    with _pytest.raises(ValueError):
        jpeg.encode_jpeg_progressive(smooth, bands=((0, 63),))
    blob = jpeg.encode_jpeg_progressive(smooth, successive=True)
    for cut in range(40, len(blob), 997):
        try:
            jpeg.decode_jpeg(blob[:cut])  # partial decode is legal...
        except (ValueError, NotImplementedError):
            pass  # ...and so is a clean raise; anything else fails


def test_image_metadata_progressive_jpeg(spark):
    """image_metadata decodes progressive JPEG for real now: dimensions
    AND mean_value populated, matching the baseline encoding."""
    import numpy as np

    from linkgraph.pipeline import jpeg, multimodal

    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, size=(17, 19, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(jpeg.encode_jpeg(rgb))),
        (2, bytearray(jpeg.encode_jpeg_progressive(rgb))),
        (3, bytearray(jpeg.encode_jpeg_progressive(rgb, successive=True))),
    ]
    df = spark.createDataFrame(rows, "id bigint, image binary")
    got = {r["id"]: r for r in multimodal.image_metadata(df).collect()}
    for i in (1, 2, 3):
        assert (got[i]["width"], got[i]["height"], got[i]["channels"]) == (19, 17, 3)
        assert got[i]["mean_value"] == got[1]["mean_value"]


def test_image_metadata_jpeg_header_dims(spark):
    """The SOF header-walk degrade (T.81 §B.2.2: dimensions real,
    mean_value null) applies ONLY to structurally valid JPEGs whose
    coding process the decoder does not implement (NotImplementedError:
    arithmetic-coded, lossless, hierarchical). Corrupt or headers-only
    streams raise ValueError and follow on_error instead — the degrade
    must not mask corruption under on_error='raise'."""
    import struct

    import pytest as _pytest

    from linkgraph.pipeline import multimodal

    def make_jpeg(w, h, comps, sof=0xC0, fill=False):
        soi = b"\xff\xd8"
        # 3 bytes per component: id, sampling factors, qtable (T.81 B.2.2)
        comp_list = b"".join(
            bytes([c + 1, 0x11, 0x00]) for c in range(comps)
        )
        sof_payload = struct.pack(">BHHB", 8, h, w, comps) + comp_list
        sof_seg = bytes([0xFF, sof]) + struct.pack(
            ">H", 2 + len(sof_payload)
        ) + sof_payload
        fillb = b"\xff" if fill else b""  # 0xFF fill bytes before a marker
        return soi + app0() + fillb + sof_seg + b"\xff\xd9"

    def app0():
        return b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9

    rows = [
        (1, make_jpeg(640, 480, 3, sof=0xC9)),  # arithmetic SOF9 -> degrade
        (2, make_jpeg(31, 17, 1, sof=0xCB)),    # arithmetic prog SOF11
        (3, make_jpeg(8, 8, 3, sof=0xC9, fill=True)),  # fill bytes tolerated
    ]
    df = spark.createDataFrame(rows, "id bigint, image binary")
    got = {r["id"]: r for r in multimodal.image_metadata(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (640, 480, 3)
    assert got[1]["mean_value"] is None
    assert (got[2]["width"], got[2]["height"], got[2]["channels"]) == (31, 17, 1)
    assert (got[3]["width"], got[3]["height"]) == (8, 8)
    assert got[1]["n_bytes"] == len(rows[0][1])
    # a headers-only BASELINE jpeg (supported process, no scan data) is
    # corrupt, not unsupported: on_error='raise' surfaces it...
    truncated = spark.createDataFrame(
        [(9, make_jpeg(16, 16, 3))], "id bigint, image binary"
    )
    with _pytest.raises(Exception, match="no SOS"):
        multimodal.image_metadata(truncated).collect()
    # ...and on_error='null' null-pads it rather than returning header
    # dims that would masquerade as a successful decode
    (r,) = multimodal.image_metadata(truncated, on_error="null").collect()
    assert r["width"] is None and r["mean_value"] is None


def test_image_metadata_jpeg_truncated_null_pads(spark):
    from linkgraph.pipeline import multimodal

    # SOS before any SOF -> not parseable without a codec -> on_error null
    bad = b"\xff\xd8\xff\xda\x00\x04\x01\x00"
    df = spark.createDataFrame([(1, bad)], "id bigint, image binary")
    (r,) = multimodal.image_metadata(df, on_error="null").collect()
    assert r["width"] is None and r["n_bytes"] is None


def test_image_metadata_real_gif(spark):
    """Real GIF decode (stdlib LZW): round-trips our writer both plain
    and interlaced, maps indices through the color table, and rejects
    truncated streams cleanly."""
    import numpy as np
    import pytest as _pytest

    from linkgraph.pipeline import multimodal

    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, size=(9, 13), dtype=np.uint8)
    blob = multimodal.encode_gif(idx, pal)
    blob_i = multimodal.encode_gif(idx, pal, interlaced=True)
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(blob_i))], "id bigint, image binary"
    )
    got = {r["id"]: r for r in multimodal.image_metadata(df).collect()}
    want = float(pal[idx].mean())
    for i in (1, 2):
        assert (got[i]["width"], got[i]["height"], got[i]["channels"]) == (13, 9, 3)
        assert abs(got[i]["mean_value"] - want) < 1e-9

    with _pytest.raises(ValueError, match="corrupt GIF"):
        multimodal.decode_image_bytes(blob[: len(blob) // 2])

    # a big frame forces LZW code-width growth past 9 bits in the writer
    big = rng.integers(0, 8, size=(40, 40), dtype=np.uint8)
    meta = multimodal.decode_image_bytes(multimodal.encode_gif(big, pal))
    assert abs(meta["mean_value"] - float(pal[big].mean())) < 1e-9


def test_video_frame_sampling_real_avi(spark):
    """Real AVI frame sampling: RIFF container walk, every-Nth-frame
    selection, MJPEG frames via the baseline JPEG decoder and raw-DIB
    frames via BMP row math; corrupt blobs null-pad under on_error."""
    import numpy as np

    from linkgraph.pipeline import multimodal, video

    rng = np.random.default_rng(21)
    frames = [rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
              for _ in range(7)]
    rows = [
        (1, bytearray(video.encode_avi(frames, codec="mjpeg"))),
        (2, bytearray(video.encode_avi(frames, codec="dib"))),
        (3, bytearray(b"RIFF\x00\x00\x00\x00AVI corrupt")),
    ]
    df = spark.createDataFrame(rows, "id bigint, video binary")
    out = multimodal.frame_sample(df, every_n=3, on_error="null").collect()
    by_id: dict = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r)
    # 7 frames, every 3rd -> indices 0, 3, 6
    for vid in (1, 2):
        got = sorted(by_id[vid], key=lambda r: r["frame_index"])
        assert [r["frame_index"] for r in got] == [0, 3, 6]
        for r in got:
            assert (r["width"], r["height"], r["channels"]) == (24, 16, 3)
            want = float(frames[r["frame_index"]].mean())
            assert abs(r["mean_value"] - want) < 1.0
    # DIB is bit-exact; MJPEG is near-lossless
    for r in by_id[2]:
        assert abs(r["mean_value"] - float(frames[r["frame_index"]].mean())) < 1e-9
    assert len(by_id[3]) == 1 and by_id[3][0]["frame_index"] is None


def test_image_dhash_invariance_and_neardup_pairs(spark):
    """dHash: the same photo through PNG vs near-lossless JPEG hashes
    within a few bits; unrelated images are far; the pair generator
    (shared pigeonhole machinery) finds exactly the near-dup pair and
    null-pads undecodable blobs out of the banding."""
    import numpy as np

    from linkgraph.pipeline import imagededup, jpeg, multimodal

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    # smooth structured image (gradient signs stable under ±2 JPEG noise)
    yy, xx = np.meshgrid(np.arange(32), np.arange(48), indexing="ij")
    base = (
        96 + 80 * np.sin(xx / 7.0) * np.cos(yy / 5.0) + xx / 2.0
    ).clip(0, 255).astype(np.uint8)
    photo = np.stack([base, base // 2 + 40, 255 - base], axis=-1)
    h_png = imagededup.dhash_bytes(multimodal.encode_png(photo))
    h_jpg = imagededup.dhash_bytes(jpeg.encode_jpeg(photo))
    assert hamming(h_png, h_jpg) <= 4
    # resize invariance: dhash samples the same relative grid
    half = photo[::2, ::2]
    assert hamming(h_png, imagededup.dhash_bytes(multimodal.encode_png(half))) <= 8

    rng = np.random.default_rng(41)
    other = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    h_other = imagededup.dhash_bytes(multimodal.encode_png(other))
    assert hamming(h_png, h_other) > 12

    rows = [
        (1, bytearray(multimodal.encode_png(photo))),
        (2, bytearray(jpeg.encode_jpeg(photo))),
        (3, bytearray(multimodal.encode_png(other))),
        (4, bytearray(b"\x89PNG\r\n\x1a\nbroken")),
    ]
    df = spark.createDataFrame(rows, "id bigint, image binary")
    pairs = imagededup.image_neardup_pairs(df, max_hamming=6).collect()
    assert {(r["a"], r["b"]) for r in pairs} == {(1, 2)}
    # undecodable blob got a NULL hash, not a crash and not a bucket
    hashes = {r["id"]: r["dhash"] for r in
              imagededup.image_dhash(df, on_error="null").collect()}
    assert hashes[4] is None and hashes[1] is not None


def test_resize_images_real(spark):
    """Real nearest-neighbor resize: decode any supported format,
    resample, re-encode as PNG; identity-size round-trips bit-equal
    pixels, downscale keeps exact source pixels (nearest semantics)."""
    import numpy as np

    from linkgraph.pipeline import jpeg, multimodal

    rng = np.random.default_rng(31)
    rgb = rng.integers(0, 256, size=(8, 12, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(multimodal.encode_png(rgb))),
        (2, bytearray(jpeg.encode_jpeg(rgb))),
        (3, bytearray(b"\x89PNG\r\n\x1a\njunk")),
    ]
    df = spark.createDataFrame(rows, "id bigint, image binary")
    out = {r["id"]: r for r in
           multimodal.resize_images(df, 6, 4, on_error="null").collect()}
    assert (out[1]["width"], out[1]["height"]) == (6, 4)
    px = multimodal.decode_image_pixels(bytes(out[1]["image"]))
    assert px.shape == (4, 6, 3)
    # nearest-neighbor: every output pixel is some exact source pixel
    ys = np.minimum((np.arange(4) * 8) // 4, 7)
    xs = np.minimum((np.arange(6) * 12) // 6, 11)
    assert np.array_equal(px, rgb[ys][:, xs])
    assert out[3]["image"] is None and out[3]["width"] is None

    # identity size on a PNG source is a lossless pixel round-trip
    same = {r["id"]: r for r in
            multimodal.resize_images(df.filter("id = 1"), 12, 8).collect()}
    assert np.array_equal(
        multimodal.decode_image_pixels(bytes(same[1]["image"])), rgb)

    # bilinear: identity size is also lossless (weights collapse to the
    # source grid); 2x upscale of a constant image stays constant, and a
    # step edge gets an intermediate value (actual interpolation)
    assert np.array_equal(multimodal.resize_pixels(rgb, 12, 8, "bilinear"), rgb)
    const = np.full((4, 4, 3), 77, dtype=np.uint8)
    assert np.array_equal(
        multimodal.resize_pixels(const, 8, 8, "bilinear"), np.full((8, 8, 3), 77))
    step = np.zeros((1, 2, 1), dtype=np.uint8)
    step[0, 1, 0] = 200
    mid = multimodal.resize_pixels(step, 4, 1, "bilinear")[0, :, 0]
    assert mid[0] == 0 and mid[3] == 200 and 0 < mid[1] < 200


def test_extract_frames_to_image_blobs(spark):
    """Video→image leg: sampled AVI frames come out as standalone PNG
    blobs that feed straight back into the image operators; optional
    in-task bilinear resize."""
    import numpy as np

    from linkgraph.pipeline import multimodal, video

    rng = np.random.default_rng(51)
    frames = [rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
              for _ in range(5)]
    df = spark.createDataFrame(
        [(1, bytearray(video.encode_avi(frames, codec="dib")))],
        "id bigint, video binary",
    )
    out = sorted(video.extract_frames(df, every_n=2).collect(),
                 key=lambda r: r["frame_index"])
    assert [r["frame_index"] for r in out] == [0, 2, 4]
    for r in out:
        px = multimodal.decode_image_pixels(bytes(r["image"]))
        assert np.array_equal(px, frames[r["frame_index"]])  # DIB is lossless

    small = video.extract_frames(df, every_n=2, resize_to=(12, 8)).collect()
    px = multimodal.decode_image_pixels(bytes(small[0]["image"]))
    assert px.shape == (8, 12, 3)


def test_minhash_hot_bucket_anchoring(spark):
    """A template-heavy corpus (many near-identical docs) must not
    self-join O(n^2): oversized LSH buckets anchor to a representative,
    the warning reports it, and the identical-doc clique still collapses
    through the anchor."""
    import warnings

    from linkgraph.pipeline.dedup import minhash_lsh_pairs

    base = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
            "eiusmod tempor incididunt ut labore et dolore magna aliqua ")
    rows = [(f"t{i}", base + f"page {i}") for i in range(40)]  # template clique
    rows += [("u1", "a completely different document about spark graphs"),
             ("u2", "another unrelated text on duckdb oracles and parquet")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        pairs = minhash_lsh_pairs(docs, max_bucket_size=10).collect()
    assert any("anchoring" in str(w.message) for w in caught)
    got = {(r["a"], r["b"]) for r in pairs}
    # the clique collapses via its min-id anchor t0
    anchored_to_t0 = {b for a, b in got if a == "t0"}
    assert len(anchored_to_t0) >= 35
    # unrelated docs never pair
    assert not any("u1" in p or "u2" in p for p in got)
    # uncapped finds the full clique pairwise; anchored is a subset
    full = {(r["a"], r["b"]) for r in
            minhash_lsh_pairs(docs, max_bucket_size=None).collect()}
    assert got <= full


def test_simhash_hot_bucket_anchoring(spark):
    import warnings

    from linkgraph.pipeline.dedup import simhash_pairs

    base = "the quick brown fox jumps over the lazy dog again and again "
    rows = [(f"t{i}", base * 3 + f"tail {i % 2}") for i in range(30)]
    rows += [("u1", "entirely different content about columnar execution")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        capped = {(r["a"], r["b"]) for r in
                  simhash_pairs(docs, max_bucket_size=5).collect()}
    assert any("anchoring" in str(w.message) for w in caught)
    full = {(r["a"], r["b"]) for r in
            simhash_pairs(docs, max_bucket_size=None).collect()}
    assert capped <= full and len(capped) > 0
    assert not any("u1" in p for p in capped)
