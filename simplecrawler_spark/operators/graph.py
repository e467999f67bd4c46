"""Link-graph analytics: PageRank over the crawl's hyperlink edges.

The reference schedules FIFO (crawler.py:81 `queue.Queue`); the
engine's G6 priority sources (in-degree / host-rank / depth,
plans/crawl.py) are per-round signals. PageRank is the OFFLINE
refinement of the same idea: computed over the accumulated link
table between crawls, its scores join onto the frontier as a
`priority` column (CrawlConfig.priority_source consumes any numeric
priority; see plans/crawl.py:458).

Engine-portable integer arithmetic: ranks are int64 masses out of
``scale`` (default 10^15), damping is the exact rational
``d_num/d_den`` (85/100), and every division is INTEGER division
(Spark `div`, DuckDB `//`). Float PageRank cannot be oracle-checked —
cross-row float addition order differs between engines and between
runs of the same engine; integer masses make q_pagerank exact.
Headroom: contributions compute rank·d_num ≤ 10^15·85 < 2^63.

Semantics (documented, pinned by tests):
  * vertices = distinct(src) ∪ distinct(dst);
  * initial rank = scale // N per vertex;
  * per iteration, v's new rank =
        scale·(d_den−d_num) // (d_den·N)                (base mass)
      + Σ_{u→v} rank(u)·d_num // (d_den·outdeg(u))      (link mass)
  * dangling vertices (no out-edges) leak their mass — the standard
    simple variant; floor divisions leak O(1) units per edge. Total
    mass therefore decays slightly; RANKING is what the priority
    consumer uses.
  * parallel edges count once (edges are distinct-ed).

Scale shape: each iteration is exactly one join of the rank table to
the edge table on src (both re-shuffle on the same key every round —
at cluster scale pre-bucket both by src and the join is co-located)
plus one map-side-combinable groupBy(dst) sum; the N-row rank frame
is localCheckpoint-ed per iteration so lineage stays flat (same
discipline as dedup.connected_components). Nothing per-vertex ever
reaches the driver. The edge/outdeg/vertex frames are re-derived per
iteration — callers running many iterations over a large graph should
persist (or better, bucket-by-src) ``edges`` before calling; the
operator deliberately owns no cache lifecycle (round-2 ADVICE:
operators must not leak persisted blocks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(edges: DataFrame, n_iter: int = 10,
             d_num: int = 85, d_den: int = 100,
             src: str = "src", dst: str = "dst",
             scale: int = 10 ** 15) -> DataFrame:
    """Integer-mass PageRank over ``edges``; returns
    (v, rank) with rank an int64 share of ``scale``. See module
    docstring for the exact arithmetic."""
    e = edges.select(F.col(src).alias("src"),
                     F.col(dst).alias("dst")).distinct()
    verts = (e.select(F.col("src").alias("v"))
             .unionByName(e.select(F.col("dst").alias("v")))
             .distinct())
    # one tiny agg: N and the constant masses ride into the plan as
    # literals (never a per-vertex driver collect)
    n = verts.count()
    if n == 0:
        return verts.withColumn("rank", F.lit(0).cast("long"))
    init = scale // n
    base = (scale * (d_den - d_num)) // (d_den * n)
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    ranks = verts.withColumn("rank", F.lit(init).cast("long"))
    for _ in range(n_iter):
        contrib = (
            ranks.join(e, ranks["v"] == e["src"])
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("v"),
                F.expr(f"rank * {d_num} div ({d_den} * outdeg)")
                .alias("c"))
            .groupBy("v").agg(F.sum("c").alias("c")))
        ranks = (verts.join(contrib, "v", "left")
                 .select("v",
                         (F.lit(base)
                          + F.coalesce(F.col("c"), F.lit(0)))
                         .cast("long").alias("rank"))
                 .localCheckpoint(eager=False))
    return ranks
