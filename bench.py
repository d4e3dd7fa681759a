"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "pagerank_edges_per_sec_per_iter": ...}

The PageRank number is the BASELINE.md north-star metric: edges/sec per
iteration (median superstep, first iteration excluded as warmup).
"""

from __future__ import annotations

import json
import os
import statistics
import time

from pyspark.sql import functions as F

from linkgraph.algos import connected_components, label_propagation, pagerank
from linkgraph.algos.triangles import triangle_list
from linkgraph.hostmeter import cpu_jiffies, steal_pct
from linkgraph.pipeline import dedup, simsearch
from linkgraph.session import get_spark, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Quiet-host gate: recorded floors live in BENCH/CANARY_FLOOR.json (written
# round 5 from a 90-minute sampling window; see BENCH/BASELINE.md "Canary
# floors"). A headline is only marked host_quiet when the pre-suite canary
# is within QUIET_RATIO of the floor; otherwise bench waits and retries
# (up to SPARK_GRAFT_QUIET_DEADLINE_S) before running degraded and saying
# so in the artifact. Ratios/deadline are env-overridable so smoke runs
# can skip the wait with SPARK_GRAFT_QUIET_DEADLINE_S=0.
QUIET_RATIO = float(os.environ.get("SPARK_GRAFT_QUIET_RATIO", "1.5"))
QUIET_DEADLINE_S = float(os.environ.get("SPARK_GRAFT_QUIET_DEADLINE_S", "900"))
QUIET_PROBE_SLEEP_S = float(os.environ.get("SPARK_GRAFT_QUIET_SLEEP_S", "45"))
_FLOOR_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH", "CANARY_FLOOR.json")


def load_floors() -> dict:
    try:
        with open(_FLOOR_FILE) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


# steal/total jiffy sampling lives in linkgraph.hostmeter (shared with
# tools/scaling_bench.py). Recorded at bench start/end AND per run so
# every BENCH artifact carries its own noisy-neighbor evidence: this box
# shows contention arriving in waves, which poisons individual runs.
# wider vertex space than the sf0.01 oracle graph so the sf0.1 graph
# stays sparse (power-law-ish degree, ~600k edges over ~10k vertices)
MOD = 9973


def bench_edges(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    return (
        li.select(
            (F.col("l_orderkey") % MOD).alias("src"),
            (F.col("l_partkey") % MOD).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def main() -> None:
    spark = get_spark(
        "linkgraph-bench",
        cores=CPUS,
        shuffle_partitions=int(CPUS) if str(CPUS).isdigit() else None,
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
    )
    timings: dict[str, float] = {}
    first_run: dict[str, float] = {}
    extras: dict[str, float] = {}
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    max_repeats = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_REPEATS", "6"))
    # REPEATS above the cap means the caller wants that many fixed runs —
    # keep the emitted methodology label truthful
    max_repeats = max(max_repeats, repeats)
    all_runs: dict[str, list[float]] = {}
    run_steal: dict[str, list] = {}
    j_start = cpu_jiffies()

    def timed(name):
        """Pinned methodology (round 3; repeats made adaptive in round
        4): report BOTH the single first run and the best-of-N per
        query, so cross-round deltas are apples-to-apples regardless of
        which convention a past round used. Best-of-N is the headline
        `queries` value: this box shows external-tenant contention
        arriving in multi-minute waves that slow EVERY kernel 2-6x
        (verified round 4: identical byte-for-byte kernels hit their
        round-3 numbers in quiet bursts and only then), plus run-1
        whole-stage-codegen compilation; the minimum is the steady-state
        cost a warm executor fleet sees. N is adaptive: minimum
        `repeats` (3) runs, then keep sampling until a second run lands
        within 25% of the best (i.e. the best is REPRODUCED, not a
        fluke) or `max_repeats` (6) is hit. The extension helps when a
        wave causes >25% run-to-run variance (the observed pattern);
        a wave slowing ALL samples uniformly is undetectable from
        timings alone — that case is caught by the per-run steal shares
        and the canary probes, which let a reader normalize or discard
        the artifact. `queries_first_run` is the cold number;
        `queries_all_runs` and `queries_run_steal_pct` expose every
        sample so noise is auditable, never hidden."""

        def deco(fn):
            best = None
            out = None
            runs = all_runs.setdefault(name, [])
            steals = run_steal.setdefault(name, [])
            i = 0
            while True:
                j0 = cpu_jiffies()
                t0 = time.monotonic()
                out = fn()
                dt = time.monotonic() - t0
                steals.append(steal_pct(j0, cpu_jiffies()))
                runs.append(round(dt, 3))
                if i == 0:
                    first_run[name] = round(dt, 3)
                best = dt if best is None else min(best, dt)
                i += 1
                if i >= max(1, repeats):
                    # explicit REPEATS<=1 means fixed single runs (smoke
                    # mode) — adaptive extension only applies from 2 up
                    reproduced = sum(1 for r in runs if r <= best * 1.25) >= 2
                    if reproduced or i >= max_repeats or repeats <= 1:
                        break
            timings[name] = round(best, 3)
            return out

        return deco

    def canary() -> float:
        """Machine-speed probe: a fixed JVM-side whole-stage-codegen
        workload (range->sum, no IO, no shuffle data) timed best-of-3.
        Identical across rounds by construction, so the ratio of this
        number between two BENCH artifacts measures the HOST, not the
        code — the normalizer for cross-round query comparisons on a
        noisy multi-tenant box."""
        best = None
        for _ in range(3):
            t0 = time.monotonic()
            spark.range(0, 2_000_000_000, 1, int(CPUS) if str(CPUS).isdigit() else 32).selectExpr(
                "sum(id * 3 + 7)"
            ).collect()
            best = min(best or 9e9, time.monotonic() - t0)
        return round(best, 3)

    def membw_canary() -> float | None:
        """Memory-bandwidth probe (hostmeter.membw_gibs — one shared
        copy with tools/scaling_bench.py). The codegen canary above is
        bandwidth-light and stayed unremarkable during a window where
        co-tenant pressure cut effective copy bandwidth 13x and doubled
        every superstep time (BENCH/scaling_run5 evidence) — this probe
        sees exactly that failure mode."""
        from linkgraph import hostmeter

        return hostmeter.membw_gibs()

    edges = bench_edges(spark).persist()
    n_edges = edges.count()

    floors = load_floors()
    canary_floor = floors.get("canary_floor_s")
    membw_floor = floors.get("membw_floor_gibs")

    # quiet-host gate: don't time the suite while a co-tenant wave is in
    # progress — wait for the canary to come back to its recorded floor.
    waited = 0.0
    probes: list[dict] = []
    while True:
        c = canary()
        m = membw_canary()
        probes.append({"canary_s": c, "membw_gibs": m, "waited_s": round(waited, 1)})
        quiet = canary_floor is None or (
            c <= QUIET_RATIO * canary_floor
            and (m is None or membw_floor is None or m >= 0.7 * membw_floor)
        )
        if quiet or waited >= QUIET_DEADLINE_S:
            break
        time.sleep(QUIET_PROBE_SLEEP_S)
        waited += QUIET_PROBE_SLEEP_S
    extras["canary_start_s"] = probes[-1]["canary_s"]
    extras["membw_start_gibs"] = probes[-1]["membw_gibs"]
    extras["quiet_wait_s"] = round(waited, 1)
    quiet_at_start = quiet

    # untimed JIT/cache warmup: one throwaway superstep-shaped pass
    # (codegen + broadcast paths compile here, not inside the timings)
    pagerank(edges, tol=None, max_iter=1)

    @timed("tpch_q1")
    def _q1():
        li = load_table(spark, SF_DIR, "lineitem")
        return (
            li.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                    "revenue"
                ),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )

    @timed("topk_per_group")
    def _topk():
        from linkgraph.ops import top_k

        orders = load_table(spark, SF_DIR, "orders")
        return top_k(
            orders, ["o_custkey"], [F.col("o_totalprice").desc()], 3
        ).count()

    @timed("pagerank_5iter")
    def _pr():
        res = pagerank(edges, tol=None, max_iter=5)
        res.state.count()
        iter_times = [m["wall_s"] for m in res.metrics[1:]]  # skip warmup
        med = statistics.median(iter_times) if iter_times else float("nan")
        # best-of-N applies to this metric too: @timed calls this twice
        # and a GC/contention outlier in run 2 must not overwrite run 1
        prev = extras.get("pagerank_median_iter_s")
        if prev is None or med < prev:
            extras["pagerank_edges_per_sec_per_iter"] = round(n_edges / med, 1)
            extras["pagerank_median_iter_s"] = round(med, 4)
        return res

    @timed("connected_components")
    def _cc():
        res = connected_components(edges, max_iter=30)
        res.state.count()
        return res

    @timed("lpa_4iter")
    def _lpa():
        res = label_propagation(edges, max_iter=4)
        res.state.count()
        return res

    @timed("triangles")
    def _tri():
        return triangle_list(edges).count()

    @timed("minhash_dedup")
    def _mh():
        docs = load_table(spark, SF_DIR, "documents")
        return dedup.minhash_lsh_pairs(
            docs, num_hashes=32, bands=8, shingle_k=7, jaccard_threshold=0.5,
            max_bucket_size=None,  # pin: keep timings comparable across rounds
        ).count()

    @timed("ann_topk")
    def _ann():
        emb = load_table(spark, SF_DIR, "embeddings")
        q = emb.limit(8).select(
            F.col("vec_id").alias("query_id"), F.col("embedding")
        )
        return simsearch.brute_force_topk(emb, q, k=10).count()

    extras["canary_end_s"] = canary()
    extras["membw_end_gibs"] = membw_canary()
    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    run_steal_total = steal_pct(j_start, cpu_jiffies())

    # host-context verdict + tenancy-adjusted numbers. host_quiet means
    # BOTH endpoints of the suite saw a canary at its floor (within
    # QUIET_RATIO) — the condition under which cross-round comparisons
    # are apples-to-apples without normalization. queries_canary_
    # normalized multiplies each best by canary_floor/canary_run (the
    # faster of the two probes bounds how fast the host was during the
    # suite) so the driver's BENCH diff is tenancy-adjusted by
    # construction even on a degraded draw.
    canary_run = min(extras["canary_start_s"], extras["canary_end_s"])
    host_extras: dict = {
        "canary_floor_s": canary_floor,
        "membw_floor_gibs": membw_floor,
        "quiet_probes": probes,
    }
    if canary_floor is not None:
        host_extras["host_quiet"] = bool(
            quiet_at_start
            and extras["canary_end_s"] <= QUIET_RATIO * canary_floor
        )
        host_extras["headline_valid"] = host_extras["host_quiet"]
        factor = canary_floor / canary_run if canary_run > 0 else 1.0
        host_extras["canary_normalize_factor"] = round(min(1.0, factor), 4)
        host_extras["queries_canary_normalized"] = {
            q: round(v * min(1.0, factor), 3) for q, v in timings.items()
        }
    print(
        json.dumps(
            {
                "metric": (
                    "linkgraph headline suite time (adaptive best-of-N "
                    "per query, min %d max %d, stop when best reproduced)"
                    % (max(1, repeats), max_repeats)
                ),
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_first_run": first_run,
                "queries_all_runs": all_runs,
                "queries_run_steal_pct": run_steal,
                "total_first_run": round(sum(first_run.values()), 3),
                "load_avg_end": os.getloadavg()[0],
                "cpu_steal_pct": run_steal_total,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "n_edges": n_edges,
                **extras,
                **host_extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
