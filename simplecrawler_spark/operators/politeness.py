"""G5 politeness + G6 priority ordering (SURVEY.md §2.5).

Reference behaviour: a robots Crawl-delay makes the single dispatch
thread sleep before each submit (crawler.py:230-239) — a global rate
limit of ~1 URL per delay-second for the (single) site. The delay never
changes WHICH urls are visited, only when.

Engine mapping (the north rule's "groupBy(host) + window-ranked
priority queues", BASELINE.json:6): per round, each host gets a fetch
budget = max(1, floor(round_seconds / crawl_delay)) (capped by
max_per_host_per_round); frontier rows are ranked per host by
(priority, url_hash) with row_number() and rows over budget are
DEFERRED — they stay in the frontier for the next round, preserving
their discovery depth. Visited-set equivalence with the reference is
exact because every deferred row is eventually scheduled (budget ≥ 1).

Scale note: row_number over PARTITION BY host is a single shuffle on
host; hot hosts are bounded by the budget itself, so the skewed tail
never fans out into the fetch stage.

Scale seam: ``delay_by_auth`` becomes a plan-inlined literal map
(F.create_map), which is right up to ~10^4 delay-carrying authorities
— robots Crawl-delay directives are rare, so the delay map stays far
smaller than the authority count. If a corpus ever exceeds that, the
budget column should come from a broadcast join against the persisted
robots table's crawl_delay column instead (same shape as
robots.can_fetch_join); the window logic below is unchanged either
way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from simplecrawler_spark.config import CrawlConfig

# cfg.max_per_host_per_round at/above this means "unconstrained" —
# matches the CrawlConfig default; set a smaller cap to force the window
UNLIMITED_BUDGET = 1_000_000


def schedule_budget(frontier: DataFrame, delay_by_auth: dict[str, float],
                    cfg: CrawlConfig) -> tuple[DataFrame, DataFrame]:
    """Split a round's frontier into (scheduled, deferred) by per-host
    budget. Returns both; deferred must be re-appended to the next
    round's frontier.

    Fast path: with no crawl delays and an unconstrained per-host cap,
    every row is scheduled — the per-host window (a shuffle on host)
    is skipped entirely.
    """
    if not delay_by_auth and cfg.max_per_host_per_round >= UNLIMITED_BUDGET:
        return frontier, frontier.limit(0)
    budget = F.lit(int(cfg.max_per_host_per_round))
    if delay_by_auth:
        mapping = F.create_map(*[
            F.lit(x) for pair in delay_by_auth.items() for x in pair])
        delay = mapping[F.col("authority")]
        from_delay = F.greatest(
            F.lit(1),
            F.floor(F.lit(float(cfg.round_seconds)) / delay).cast("int"))
        budget = F.when(delay.isNotNull(),
                        F.least(budget, from_delay)).otherwise(budget)
    w = Window.partitionBy("host").orderBy(
        F.col("priority").asc(), F.col("url_hash").asc())
    ranked = frontier.withColumn("_rank", F.row_number().over(w)) \
                     .withColumn("_budget", budget)
    scheduled = ranked.filter(F.col("_rank") <= F.col("_budget")) \
                      .drop("_rank", "_budget")
    deferred = ranked.filter(F.col("_rank") > F.col("_budget")) \
                     .drop("_rank", "_budget")
    return scheduled, deferred
