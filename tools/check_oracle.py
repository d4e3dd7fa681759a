"""Local harness mimicking the driver's correctness gate: run every
queries() entry in Spark and its oracle_sql() in DuckDB on the same
parquet tables; compare row count, sorted schema, and order-insensitive
values. Usage:
PYTHONPATH=. python tools/check_oracle.py [--json out.json] [sf_dir] [names...]"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from linkgraph.session import TESTDATA_TABLES, get_spark  # noqa: E402


def canon(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = f"{v:.10g}"
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    results: dict[str, dict] = {}
    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8, driver_memory="8g")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            spandas = sdf.toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {str(e)[:200]}")
            continue
        t_spark = time.monotonic() - t0
        if name not in oracles:
            print(f"ok*   {name}: rows={len(spandas)} (no oracle, rows-only) [{t_spark:.1f}s]")
            continue
        try:
            opandas = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {str(e)[:200]}")
            continue
        scols, ocols = sorted(spandas.columns), sorted(opandas.columns)
        if scols != ocols:
            failures.append(name)
            print(f"FAIL  {name}: schema {scols} vs {ocols}")
            continue
        if len(spandas) != len(opandas):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(spandas)} vs {len(opandas)}")
            continue
        a = canon(spandas.to_dict("records"), scols)
        b = canon(opandas.to_dict("records"), scols)
        if a != b:
            failures.append(name)
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL  {name}: values differ, e.g. {diff}")
            continue
        print(f"OK    {name}: rows={len(spandas)} [{t_spark:.1f}s]")
        results[name] = {
            "ok": True,
            "rows": len(spandas),
            "spark_s": round(t_spark, 2),
        }
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    if json_out:
        import json

        for f in failures:
            results[f] = {"ok": False}
        with open(json_out, "w") as fh:
            json.dump(
                {"sf_dir": sf_dir, "checked_at": time.time(), "results": results},
                fh,
                indent=2,
            )
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
