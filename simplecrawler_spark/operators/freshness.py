"""Recrawl scheduling: change-rate estimation + freshness priority.

The reference crawls a site once and stops (crawler.py drains its
queue); a production crawler re-visits. The standard scheduler (Cho &
Garcia-Molina, "Effective Page Refresh Policies for Web Crawlers",
TODS 2003) estimates each page's change rate from its observed fetch
history and re-fetches pages in order of expected staleness. This
module is that OFFLINE refinement, same role as pagerank/hits: its
output joins onto the frontier as a ``priority`` column
(CrawlConfig.priority_source consumes any numeric priority).

Engine-portable integer arithmetic (the q_recrawl oracle twins it):

  * input = the fetch log (one row per fetch: url key, fetch time in
    epoch seconds, content fingerprint);
  * a fetch observed a CHANGE when its fingerprint differs from the
    previous fetch of the same url (lag over a deterministic
    per-url order — ties broken by caller-supplied columns);
  * change rate  λ_scaled = n_changes · scale // n_fetches   (int64,
    ≤ scale — the empirical change fraction, Cho's estimator without
    the small-sample bias correction, kept rational so both engines
    agree bit-for-bit);
  * staleness priority = λ_scaled · age_s, where age_s = now_s −
    last_fetch_s. Headroom: scale 10^6 × age < 2^63 for ages up to
    ~292k years.

First-seen URLs (single fetch, no prior fingerprint) have
n_changes = 0 → priority 0: freshness scheduling only competes among
KNOWN pages; discovery priority comes from the other sources.

Scale shape: one per-url window (lag) + one map-side-combinable
groupBy(url) — both shuffle on the url key once (Spark plans them in
the same Exchange); ``now_s=None`` derives "now" as the corpus max
fetch time via a 1-row aggregate crossJoined back in (broadcast,
never a driver collect). Nothing per-url reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["recrawl_priority"]


def recrawl_priority(fetch_log: DataFrame, *, url_col: str = "url_hash",
                     ts_col: str = "ts_s", fp_col: str = "fingerprint",
                     now_s: int | None = None,
                     scale: int = 10 ** 6,
                     order_cols: tuple[str, ...] = ()) -> DataFrame:
    """Per-url freshness schedule from a fetch log; returns
    (``url_col``, n_fetches, n_changes, last_fetch_s, lambda_scaled,
    age_s, priority). See the module docstring for the exact
    arithmetic. ``order_cols`` must make the per-url fetch order
    total when fetch timestamps can tie (determinism contract)."""
    w = Window.partitionBy(url_col).orderBy(
        F.col(ts_col), *[F.col(c) for c in order_cols])
    prev_fp = F.lag(fp_col).over(w)
    obs = fetch_log.select(
        url_col, ts_col,
        (prev_fp.isNotNull() & (F.col(fp_col) != prev_fp))
        .cast("long").alias("_changed"))
    per_url = obs.groupBy(url_col).agg(
        F.count("*").alias("n_fetches"),
        F.sum("_changed").alias("n_changes"),
        F.max(ts_col).cast("long").alias("last_fetch_s"))
    if now_s is None:
        now = fetch_log.agg(
            F.max(ts_col).cast("long").alias("_now_s"))
        per_url = per_url.crossJoin(F.broadcast(now))
    else:
        per_url = per_url.withColumn("_now_s",
                                     F.lit(int(now_s)).cast("long"))
    return (per_url
            .withColumn("lambda_scaled",
                        F.expr(f"n_changes * {scale} div n_fetches")
                        .cast("long"))
            .withColumn("age_s",
                        (F.col("_now_s") - F.col("last_fetch_s"))
                        .cast("long"))
            .withColumn("priority",
                        (F.col("lambda_scaled") * F.col("age_s"))
                        .cast("long"))
            .drop("_now_s"))
