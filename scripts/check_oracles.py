#!/usr/bin/env python
"""Mirror the driver's correctness gate at sf0.01: run every queries()
entry on Spark and its oracle on DuckDB, compare sorted-column rowsets.
Prints per-query PASS/FAIL and a summary JSON line."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _normalize(val):
    if isinstance(val, float):
        return round(val, 9)
    return val


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_normalize(r[i]) for i in order) for r in rows)


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    results = {}
    for name in sorted(qs):
        if only is not None and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                results[name] = {"status": "ROWS_ONLY",
                                 "rows": len(srows),
                                 "sec": round(time.monotonic() - t0, 2)}
                print(f"{name}: ROWS_ONLY {len(srows)} rows")
                continue
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            ok_cols = sorted(scols) == sorted(dcols)
            ok_rows = _rowset(scols, srows) == _rowset(dcols, drows)
            status = "PASS" if (ok_cols and ok_rows) else "FAIL"
            results[name] = {"status": status, "spark_rows": len(srows),
                             "duck_rows": len(drows),
                             "sec": round(time.monotonic() - t0, 2)}
            if not ok_cols:
                results[name]["cols"] = [sorted(scols), sorted(dcols)]
            print(f"{name}: {status} spark={len(srows)} duck={len(drows)} "
                  f"{results[name]['sec']}s")
        except Exception as exc:  # noqa: BLE001
            results[name] = {"status": "ERROR", "error": str(exc)[:500]}
            print(f"{name}: ERROR {str(exc)[:200]}")
    n_fail = sum(1 for r in results.values()
                 if r["status"] in ("FAIL", "ERROR"))
    print(json.dumps({"sf_dir": SF_DIR, "n": len(results),
                      "fails": n_fail}))
    spark.stop()


if __name__ == "__main__":
    main()
