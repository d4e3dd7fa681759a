"""Gated scaling retry: probe the codegen canary + membw until the host
is at its recorded floor (BENCH/CANARY_FLOOR.json, same gate rule as
bench.py), then run tools/scaling_bench.py once. Emits the scaling JSON
on stdout prefixed by the gate evidence line.

Usage: PYTHONPATH=/root/repo python tools/quiet_scaling_retry.py \
          [--deadline-min 60] [--n 1] [--iters 15]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--deadline-min", type=float, default=60.0)
    p.add_argument("--n", type=int, default=1)
    p.add_argument("--iters", type=int, default=15)
    p.add_argument("--sleep-s", type=float, default=60.0)
    args = p.parse_args()

    floors = json.load(open(os.path.join(REPO, "BENCH", "CANARY_FLOOR.json")))
    canary_floor = floors["canary_floor_s"]
    membw_floor = floors["membw_floor_gibs"]

    from linkgraph import hostmeter
    from linkgraph.session import get_spark

    spark = get_spark("quiet-gate", cores="32", shuffle_partitions=32,
                      driver_memory="4g")
    spark.range(0, 2_000_000_000, 1, 32).selectExpr("sum(id * 3 + 7)").collect()

    def probe() -> tuple[float, float | None]:
        best = None
        for _ in range(3):
            t0 = time.monotonic()
            spark.range(0, 2_000_000_000, 1, 32).selectExpr(
                "sum(id * 3 + 7)"
            ).collect()
            best = min(best or 9e9, time.monotonic() - t0)
        return round(best, 3), hostmeter.membw_gibs()

    deadline = time.monotonic() + args.deadline_min * 60
    probes = []
    while True:
        c, m = probe()
        probes.append({"canary_s": c, "membw_gibs": m})
        quiet = c <= 1.5 * canary_floor and (m is None or m >= 0.7 * membw_floor)
        if quiet or time.monotonic() > deadline:
            break
        time.sleep(args.sleep_s)
    spark.stop()
    print(json.dumps({"gate": probes[-1], "quiet": quiet,
                      "n_probes": len(probes)}), flush=True)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scaling_bench.py"),
         "--n", str(args.n), "--iters", str(args.iters)],
        capture_output=True, text=True)
    sys.stdout.write(r.stdout)
    sys.stderr.write(r.stderr[-2000:])
    sys.exit(r.returncode)


if __name__ == "__main__":
    main()
