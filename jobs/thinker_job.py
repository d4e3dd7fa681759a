"""spark-submit entry point: thinker concept rules over a triple table.

The reference's thinker lifecycle (rules from a simplified dialect +
a graph state -> DefaultThinker.find, Thinker.java:21-28) as a batch
Spark job: facts parquet (s, p, o) + a rules file in the reference's
surface syntax (Define on concept / relation, DefinePriority —
KGDSL.g4:960-998) -> saturated closure parquet.

    spark-submit --py-files linkgraph.zip jobs/thinker_job.py \\
        --facts /path/triples --rules rules.thinker --out /path/closure \\
        [--isa /path/isa] [--priority-out /path/pri] \\
        [--find s=...,p=...,o=...]

Prints one JSON line: base/derived fact counts, per-kind rule counts,
wall time. --find additionally prints up to 20 matching closure rows
(the Thinker.find(s, p, o) probe; omitted elements are wildcards).

Non-ASCII --find values (concept ids are usually CJK) need a UTF-8
locale (LC_ALL=C.UTF-8) — under the POSIX default, spark-submit's argv
round-trip mangles them and the probe silently matches nothing.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--facts", required=True, help="parquet of (s, p, o)")
    p.add_argument("--rules", required=True, help="thinker_script file")
    p.add_argument("--out", default=None, help="closure parquet output")
    p.add_argument("--isa", default=None,
                   help="parquet of (child, parent) concept taxonomy for hits()")
    p.add_argument("--priority-out", default=None,
                   help="parquet for per-subject max-priority concepts "
                        "(needs a DefinePriority rule)")
    p.add_argument("--find", default=None,
                   help="probe the closure: comma list of s=/p=/o= bindings")
    p.add_argument("--max-iter", type=int, default=20)
    args = p.parse_args()

    spark = SparkSession.builder.appName("linkgraph-thinker").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from linkgraph.thinker import find
    from linkgraph.thinker_dsl import (
        PriorityRule,
        apply_priority,
        infer_thinker,
        parse_thinker,
    )

    t0 = time.monotonic()
    with open(args.rules) as f:
        rules = parse_thinker(f.read())
    facts = spark.read.parquet(args.facts)
    isa = spark.read.parquet(args.isa) if args.isa else None
    n_base = facts.count()
    closure = infer_thinker(facts, rules, isa=isa, max_iter=args.max_iter)
    n_total = closure.count()

    if args.out:
        closure.write.mode("overwrite").parquet(args.out)
    pri_rows = None
    if args.priority_out:
        pri = next((r for r in rules if isinstance(r, PriorityRule)), None)
        if pri is None:
            raise SystemExit("--priority-out needs a DefinePriority rule")
        pdf = apply_priority(closure, pri)
        pdf.write.mode("overwrite").parquet(args.priority_out)
        pri_rows = pdf.count()

    out = {
        "base_facts": n_base,
        "derived_facts": n_total - n_base,
        "rules": {
            k: sum(1 for r in rules if type(r).__name__ == k)
            for k in ("ConceptRule", "RelationRule", "PriorityRule")
        },
        "wall_s": round(time.monotonic() - t0, 3),
    }
    if pri_rows is not None:
        out["priority_rows"] = pri_rows
    if args.find:
        probe = {}
        for kv in args.find.split(","):
            k, _, v = kv.partition("=")
            if k not in ("s", "p", "o"):
                raise SystemExit(f"--find keys are s/p/o, got {k!r}")
            probe[k] = v
        rows = find(closure, **probe).limit(20).collect()
        out["find"] = [[r["s"], r["p"], r["o"]] for r in rows]
    print(json.dumps(out, ensure_ascii=False))
    spark.stop()


if __name__ == "__main__":
    main()
