#!/usr/bin/env python
"""Physical-plan audit → BENCH/PLANS.md.

Captures `explain("formatted")` for representative queries and checks
the properties the 100 TB design depends on:

  * column pruning: parquet ReadSchema carries only consumed columns
  * predicate pushdown: PushedFilters non-empty where a filter exists
  * whole-stage codegen present on the JVM paths
  * the politeness fast path plans NO exchange when unconstrained
  * the canonical fast path keeps one (and only one) Arrow eval per
    canonicalisation chain
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_ops(plan: str, op: str) -> int:
    """Count physical operators by their detail headers — the tree
    summary at the top repeats every name once more."""
    import re
    return len(re.findall(rf"^\(\d+\) {op}", plan, re.M))


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from simplecrawler_spark.config import CrawlConfig
    from simplecrawler_spark.operators.politeness import schedule_budget

    # AQE off for the audit: explain() on an AdaptiveSparkPlan shows
    # the pre-execution plan without codegen annotations
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.sql.adaptive.enabled", "false")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    qs = E.queries()
    checks: list[tuple[str, bool, str]] = []
    sections: list[tuple[str, str]] = []

    # 1. column pruning + codegen on a canonicalisation query
    plan = formatted(qs["q_canonicalize"](spark, SF_DIR))
    sections.append(("q_canonicalize", plan))
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    checks.append(("q_canonicalize scans only o_orderkey,o_custkey",
                   bool(read) and "o_comment" not in read[0]
                   and "o_custkey" in read[0],
                   read[0].strip() if read else "no ReadSchema"))
    checks.append(("q_canonicalize has WholeStageCodegen",
                   "WholeStageCodegen" in plan
                   or "codegen id" in plan, ""))
    checks.append(("q_canonicalize exactly one Arrow eval",
                   n_ops(plan, "ArrowEvalPython") == 1,
                   f"count={n_ops(plan, 'ArrowEvalPython')}"))

    # 2. predicate pushdown on a filtered scan
    df = (spark.read.parquet(f"{SF_DIR}/orders.parquet")
          .where(F.col("o_orderkey") < 100).select("o_orderkey"))
    plan = formatted(df)
    sections.append(("filtered orders scan", plan))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    checks.append(("filter pushed to parquet scan",
                   bool(pushed) and "LessThan(o_orderkey,100" in pushed[0],
                   pushed[0].strip() if pushed else "none"))

    # 3. politeness fast path: unconstrained budget plans no Exchange
    ev = (spark.read.parquet(f"{SF_DIR}/events.parquet")
          .select(F.col("user_id").cast("string").alias("host"),
                  F.col("user_id").cast("string").alias("authority"),
                  F.lit(0.0).alias("priority"),
                  F.col("event_id").alias("url_hash")))
    sched_fast, _ = schedule_budget(ev, {}, CrawlConfig())
    plan_fast = formatted(sched_fast)
    sections.append(("politeness fast path (no delays)", plan_fast))
    checks.append(("unconstrained politeness plans no Exchange",
                   n_ops(plan_fast, "Exchange") == 0, ""))
    sched_win, _ = schedule_budget(ev, {}, CrawlConfig(
        max_per_host_per_round=5))
    plan_win = formatted(sched_win)
    sections.append(("politeness window (budget=5)", plan_win))
    checks.append(
        ("budgeted politeness: one host exchange, map-side group limit",
         n_ops(plan_win, "Exchange") == 1
         and n_ops(plan_win, "WindowGroupLimit") >= 1,
         f"exchanges={n_ops(plan_win, 'Exchange')}, "
         f"group_limits={n_ops(plan_win, 'WindowGroupLimit')}"))

    # 4. seen anti-join structure
    plan = formatted(qs["q_seen_antijoin"](spark, SF_DIR))
    sections.append(("q_seen_antijoin", plan))
    checks.append(("anti-join present",
                   "LeftAnti" in plan or "left_anti" in plan.lower(), ""))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/PLANS.md", "w") as fh:
        fh.write("# Physical-plan audit (`explain(\"formatted\")`)\n\n")
        fh.write("| check | ok | evidence |\n|---|---|---|\n")
        for name, ok, ev_ in checks:
            fh.write(f"| {name} | {'PASS' if ok else 'FAIL'} | "
                     f"{ev_[:120]} |\n")
        for title, plan in sections:
            fh.write(f"\n## {title}\n\n```\n{plan[:4000]}\n```\n")
    failed = [c for c in checks if not c[1]]
    for name, ok, ev_ in checks:
        print(("PASS " if ok else "FAIL ") + name + (f" [{ev_}]" if ev_ else ""))
    print(f"{len(checks) - len(failed)}/{len(checks)} plan checks pass "
          "-> BENCH/PLANS.md")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
