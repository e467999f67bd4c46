#!/usr/bin/env python
"""Benchmark harness (driver contract + BASELINE.md scaling protocol).

Default: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

--scaling: run the identical crawl job at local[8] and local[32]
(N vs 4N cores — the sandbox stand-in for N vs 4N executors,
BASELINE.md protocol) in fresh subprocesses, compute scaling
efficiency = (T32_throughput / T8_throughput) / 4, and write
BENCH/SCALING.md.

--crawl-only: internal mode used by --scaling (crawl job only, one
JSON line).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time


def build_spark(cpus: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("simplecrawler-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.default.parallelism", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def crawl_bench(spark, n_pages: int, n_hosts: int = 64):
    """The headline job: BFS-crawl a synthetic web graph (Zipf-skewed
    hosts). Returns (urls_done, urls_seen, wall_sec)."""
    from simplecrawler_spark.config import CrawlConfig
    from simplecrawler_spark.plans.crawl import FrontierCrawler
    from simplecrawler_spark.sources.fetch import TableFetcher
    from simplecrawler_spark.sources.fixtures import synthetic_graph

    graph = synthetic_graph(spark, n_pages=n_pages, n_hosts=n_hosts,
                            out_degree=8)
    graph = graph.repartition(spark.sparkContext.defaultParallelism)
    graph.persist().count()  # materialise outside the timed window
    # seed must be a real page of the hashed-host graph
    from pyspark.sql import functions as F
    seed = graph.agg(F.min("url")).first()[0]

    cfg = CrawlConfig(same_authority_only=False, max_rounds=8,
                      bloom_enabled=True)
    fetcher = TableFetcher(graph, cfg)
    # broadcast of a large graph would OOM the driver: fetch joins use
    # a shuffle join automatically above the broadcast threshold
    root = tempfile.mkdtemp(prefix="bench-crawl-")
    crawler = FrontierCrawler(spark, fetcher, cfg, root=root)

    t0 = time.monotonic()
    crawler.crawl(seed)
    wall = time.monotonic() - t0
    snaps = crawler.store.snapshots()
    done = sum(s["metrics"].get("done_new", 0) for s in snaps)
    seen = sum(s["metrics"].get("new_urls", 0) for s in snaps)
    graph.unpersist()
    return done, seen, wall


def pipeline_benches(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as E

    timings: dict[str, float] = {}
    names = ["q_canonicalize", "q_seen_antijoin", "q_politeness_window",
             "q_dedup_exact", "q_lsh_pairs", "q_simhash", "q_lang_quality",
             "q_cosine_topk", "q_ann_lsh"]
    qs = E.queries()
    for name in names:
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - t0, 3)
    return timings


def scale_pages(sf: float) -> int:
    # ~600k lineitem rows at sf0.1 ↔ 100k synthetic pages (×8 links)
    return max(10_000, int(1_000_000 * sf))


def run_default():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = build_spark(cpus)

    timings: dict[str, float] = {}
    t0 = time.monotonic()
    done, seen, wall = crawl_bench(spark, scale_pages(sf))
    timings["crawl_bfs"] = round(wall, 3)
    timings.update(pipeline_benches(spark, sf_dir))
    total = round(time.monotonic() - t0, 3)

    print(json.dumps({
        "metric": "headline crawl+pipeline wall time "
                  f"(crawl: {done} done / {seen} deduped urls, "
                  f"{round((done + seen) / max(wall, 1e-9))} urls/sec)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


def run_crawl_only():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_pages = int(os.environ.get("SPARK_GRAFT_PAGES", "100000"))
    spark = build_spark(cpus)
    done, seen, wall = crawl_bench(spark, n_pages)
    print(json.dumps({"cpus": int(cpus), "pages": n_pages, "done": done,
                      "seen": seen, "wall_sec": round(wall, 3),
                      "urls_per_sec": round((done + seen) / wall, 1)}))
    spark.stop()


def run_scaling():
    """BASELINE.md protocol: identical job, local[8] vs local[32]."""
    n_pages = os.environ.get("SPARK_GRAFT_PAGES", "100000")
    results = {}
    for cpus in ("8", "32"):
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus,
                   SPARK_GRAFT_PAGES=n_pages)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--crawl-only"],
            env=env, capture_output=True, text=True, check=True)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(f"local[{cpus}]: {line}")

    t8 = results["8"]["urls_per_sec"]
    t32 = results["32"]["urls_per_sec"]
    eff = (t32 / t8) / 4
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/SCALING.md", "w") as fh:
        fh.write(
            "# Scaling protocol run (N vs 4N cores — BASELINE.md)\n\n"
            f"synthetic frontier: {n_pages} pages, out-degree 8, 64 hosts "
            "(Zipf-skewed)\n\n"
            "| config | pages done | urls deduped | wall (s) | urls/sec |\n"
            "|---|---|---|---|---|\n"
            f"| local[8] (N) | {results['8']['done']} | {results['8']['seen']} "
            f"| {results['8']['wall_sec']} | {t8} |\n"
            f"| local[32] (4N) | {results['32']['done']} | "
            f"{results['32']['seen']} | {results['32']['wall_sec']} | {t32} |\n\n"
            f"**throughput ratio 4N/N = {t32 / t8:.2f}; scaling efficiency "
            f"= {eff:.2f}** (gate: ≥ 0.8)\n")
    print(json.dumps({"t8_urls_per_sec": t8, "t32_urls_per_sec": t32,
                      "scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--crawl-only" in sys.argv:
        run_crawl_only()
    else:
        run_default()
