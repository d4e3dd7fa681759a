"""spark-submit entry point: any linkgraph algorithm over an edge table.

    spark-submit --py-files linkgraph.zip jobs/graph_job.py \\
        --algo cc --edges /path/edges --out /path/out

Algorithms: pagerank | cc | cc-two-phase | lpa | triangles.
Prints one JSON line (rows, iterations, wall time, per-superstep times).
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--algo", required=True,
                   choices=["pagerank", "cc", "cc-two-phase", "lpa", "triangles"])
    p.add_argument("--edges", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--tol", type=float, default=None)
    p.add_argument("--checkpoint-dir", default=None)
    args = p.parse_args()

    spark = SparkSession.builder.appName(f"linkgraph-{args.algo}").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from linkgraph.algos import (
        connected_components,
        label_propagation,
        pagerank,
    )
    from linkgraph.algos.triangles import triangle_list

    edges = spark.read.parquet(args.edges)
    n_edges = edges.count()
    t0 = time.monotonic()
    info: dict = {"algo": args.algo, "n_edges": n_edges}
    if args.algo == "triangles":
        tl = triangle_list(edges)
        if args.out:
            tl.write.mode("overwrite").parquet(args.out)
            info["rows"] = spark.read.parquet(args.out).count()
        else:
            info["rows"] = tl.count()
    else:
        kw = dict(checkpoint_dir=args.checkpoint_dir, max_iter=args.iters)
        if args.algo == "pagerank":
            res = pagerank(edges, tol=args.tol, **kw)
        elif args.algo == "cc":
            res = connected_components(edges, **kw)
        elif args.algo == "cc-two-phase":
            res = connected_components(edges, algorithm="two-phase", **kw)
        else:
            res = label_propagation(edges, **kw)
        if args.out:
            res.state.write.mode("overwrite").parquet(args.out)
            info["rows"] = spark.read.parquet(args.out).count()
        else:
            info["rows"] = res.state.count()
        info["iterations"] = res.iterations
        info["converged"] = res.converged
        info["iter_times_s"] = [round(m["wall_s"], 3) for m in res.metrics]
    info["total_wall_s"] = round(time.monotonic() - t0, 3)
    print(json.dumps(info))
    spark.stop()


if __name__ == "__main__":
    main()
