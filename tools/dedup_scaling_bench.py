"""Scaling evidence for the dedup path: minhash-LSH pair generation at
two parallelism levels (same protocol as tools/scaling_bench.py, which
covers the north-rule PageRank path).

Generates a deterministic synthetic corpus ENTIRELY ON EXECUTORS
(spark.range -> seeded word picks via Catalyst hash arithmetic — no
driver-side text building), plants exact duplicates, then times
minhash_lsh_pairs end-to-end (signatures + banded candidate join +
verify) at local[N] and local[4N].

Usage: python tools/dedup_scaling_bench.py [--docs 400000] [--n 2]
Prints one JSON line; paste the numbers into BENCH/BASELINE.md's
appendix if refreshed.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time


def corpus(spark, n_docs: int, words_per_doc: int = 40, dup_every: int = 50):
    """Deterministic docs: word w of doc d = 'w' + hash(d', w) % 5000,
    where d' = d - (d % dup_every == 1) makes ~2% exact-dup pairs."""
    from pyspark.sql import functions as F

    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    eff = F.when(
        (F.col("doc_id") % dup_every == 1) & (F.col("doc_id") > 0),
        F.col("doc_id") - 1,
    ).otherwise(F.col("doc_id"))
    words = F.transform(
        F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
        lambda i: F.concat(
            F.lit("w"), (F.xxhash64(eff, i) % 5000 + 5000) % 5000
        ),
    )
    return base.select("doc_id", F.array_join(words, " ").alias("text"))


def run_level(cores: int, n_docs: int, reps: int) -> dict:
    from linkgraph.pipeline import dedup
    from linkgraph.session import get_spark

    spark = get_spark(
        f"dedup-scale-{cores}",
        cores=cores,
        shuffle_partitions=cores * 4,
        driver_memory="24g",
    )
    docs = corpus(spark, n_docs).persist()
    docs.count()
    times = []
    pairs = None
    for _ in range(reps):
        t0 = time.monotonic()
        pairs = dedup.minhash_lsh_pairs(
            docs, num_hashes=32, bands=8, shingle_k=7, jaccard_threshold=0.5,
            max_bucket_size=None,  # pin: stored baselines are uncapped
        ).count()
        times.append(time.monotonic() - t0)
    docs.unpersist()
    spark.stop()
    med = statistics.median(times[1:]) if len(times) > 1 else times[0]
    return {
        "cores": cores,
        "n_docs": n_docs,
        "pairs": pairs,
        "times_s": [round(t, 2) for t in times],
        "median_s": round(med, 3),
        "docs_per_sec": round(n_docs / med, 1),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--docs", type=int, default=400_000)
    p.add_argument("--n", type=int, default=2)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()
    lo = run_level(args.n, args.docs, args.reps)
    print("N:", json.dumps(lo), file=sys.stderr)
    hi = run_level(4 * args.n, args.docs, args.reps)
    print("4N:", json.dumps(hi), file=sys.stderr)
    eff = lo["median_s"] / (4 * hi["median_s"])
    print(
        json.dumps(
            {
                "metric": "minhash_lsh_pairs scaling",
                "n_cores": lo["cores"],
                "4n_cores": hi["cores"],
                "n_docs": args.docs,
                "median_s_N": lo["median_s"],
                "median_s_4N": hi["median_s"],
                "docs_per_sec_N": lo["docs_per_sec"],
                "docs_per_sec_4N": hi["docs_per_sec"],
                "scaling_efficiency": round(eff, 3),
                "pairs": lo["pairs"],
            }
        )
    )


if __name__ == "__main__":
    main()
