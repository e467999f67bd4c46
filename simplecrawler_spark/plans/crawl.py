"""FrontierCrawler — the engine's core "query" (SURVEY.md §2.6, §3.4).

The reference loop (/root/reference/simple_crawler/crawler.py:196-242 +
_crawl_url :145-180 + _parse_hrefs :132-143) is a FIFO queue + thread
pool over one site. This engine is the batch-iterative BFS fixpoint the
north rule mandates (BASELINE.json:6,14):

    Round r:
      frontier_r  = read frontier WHERE round = r       (file-pruned scan)
      eligible    = frontier_r ⟕ anti-join(results)     (R5 done-skip)
      allowed     = robots can_fetch gate               (G4)
      scheduled,
      deferred    = per-host window budget              (G5)
      fetched     = fetch(scheduled)                    (S2; gates G1/G2)
      results    += fetched 2xx (parsed := mime-ok)     (R6; wrong-MIME done-not-parsed)
      links       = parsed pages → extract → trim → resolve(base_raw)
                    → canonicalize → same-authority     (P1/P2, F12, F16, F8, R3)
      new         = dedupe(round) → bloom + anti-join(seen)   (R1/R4)
      seen       += new;  frontier_{r+1} = new ∪ deferred     (R9)
      snapshot    = commit (frontier, seen, results, metrics, bloom sidecar)
    Terminate when frontier_{r+1} is empty (R7/R8 — equivalent to the
    reference's seen==done / queue-timeout exits, SURVEY.md §2.6.1).

Scale properties:
  * every round's state round-trips through Parquet — lineage stays
    flat across rounds (no unbounded plan growth), and a killed job
    resumes from the last committed snapshot exactly.
  * the seen anti-join is Bloom-prefiltered (operators/seen.py); the
    politeness window is the only per-host shuffle; the fetch input is
    salted/rebalanced on url_hash so hot hosts don't serialise a stage.
  * per-round metrics come free from parquet footer lineage — no extra
    count() jobs on the hot path.

Visited-set parity with the reference is asserted by
tests/test_crawl.py (table graphs) and tests/test_reference_e2e.py
(the actual reference crawler on a live Flask copy of the same graph).
"""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simplecrawler_spark.config import CrawlConfig
from simplecrawler_spark.functions.canonical import (
    canon_parts, canonicalize_df, resolve, trim_query_fragment_expr, url_hash,
)
from simplecrawler_spark.operators.parse import explode_links
from simplecrawler_spark.operators.politeness import schedule_budget
from simplecrawler_spark.operators.robots import (
    build_robots_table, can_fetch_filter, crawl_delay_map,
)
from simplecrawler_spark.operators.seen import (
    BloomSeen, anti_join_seen, host_bucket_expr,
)
from simplecrawler_spark.plans import schemas
from simplecrawler_spark.plans.tables import SnapshotStore
from simplecrawler_spark.sources.fetch import mime_ok_expr, status_class_expr

import pandas as pd


class FrontierCrawler:
    """Batch-iterative frontier crawler.

    :param fetcher: callable(frontier_df) -> fetched_df — a
        sources.fetch.TableFetcher (tests/bench) or HttpFetcher
        (parity against a live server).
    """

    def __init__(self, spark: SparkSession, fetcher, cfg: CrawlConfig | None = None,
                 root: str | None = None):
        self.spark = spark
        self.fetcher = fetcher
        self.cfg = cfg or CrawlConfig()
        self.root = root or tempfile.mkdtemp(prefix="crawl-")
        self.store = SnapshotStore(spark, self.root, schemas={
            "frontier": schemas.FRONTIER, "seen": schemas.SEEN,
            "results": schemas.RESULTS, "metrics": schemas.METRICS,
        })
        self.bloom: BloomSeen | None = None
        self._bloom_path = os.path.join(self.root, "sidecar", "bloom.npz")
        self._robots: pd.DataFrame | None = None
        self._delays: dict[str, float] = {}

    # ------------------------------------------------------------------ #

    def _seed_frontier(self, seeds: list[str]) -> DataFrame:
        rows, seen_norm = [], set()
        for s in seeds:
            norm, scheme, authority, host, *_ = canon_parts(s)
            if norm in seen_norm:
                continue  # seed set semantics
            seen_norm.add(norm)
            rows.append((norm, s, None, authority, host, 0, 0.0, None, 0))
        df = self.spark.createDataFrame(rows, schemas.FRONTIER)
        return df.withColumn("url_hash", url_hash(F.col("url_norm")))

    def _ensure_robots(self, frontier_r: DataFrame) -> None:
        """Fetch robots.txt for authorities not yet covered. The
        reference fetches robots unconditionally, once per crawl
        (crawler.py:201-203); multi-authority crawls extend that to
        once per authority."""
        if self._robots is None:
            self._robots = pd.DataFrame(
                columns=["authority", "robots_txt", "crawl_delay"])
        known = set(self._robots["authority"])
        missing = frontier_r.filter(F.col("authority") != "")
        if known:
            missing = missing.filter(~F.col("authority").isin(list(known)))
        if missing.isEmpty():
            return
        new_rows = build_robots_table(missing, self.fetcher, self.cfg)
        if not new_rows.empty:
            self._robots = (new_rows if self._robots.empty else
                            pd.concat([self._robots, new_rows],
                                      ignore_index=True))
            self._delays = crawl_delay_map(self._robots)

    # ------------------------------------------------------------------ #

    def crawl(self, seeds: str | list[str]) -> DataFrame:
        """Run the BFS fixpoint from ``seeds``; returns the results
        DataFrame (url_norm … — reference returns the done-set as
        strings, crawler.py:244-251)."""
        if isinstance(seeds, str):
            seeds = [seeds]
        cfg = self.cfg
        if cfg.bloom_enabled:
            self.bloom = BloomSeen(expected_items=max(cfg.bloom_min_items, 1 << 20),
                                   fpp=cfg.bloom_fpp)
        self.store.append("frontier", self._seed_frontier(seeds))
        return self._run_rounds(start_round=0)

    def _run_rounds(self, start_round: int) -> DataFrame:
        cfg = self.cfg
        r = start_round
        while r < cfg.max_rounds:
            frontier_r = self.store.read("frontier").where(F.col("round") == r)
            if frontier_r.isEmpty():
                break
            next_count = self._round(frontier_r, r)
            if next_count == 0:  # R7/R8 fixpoint
                break
            r += 1
        return self.results()

    def _round(self, frontier_r: DataFrame, r: int) -> int:
        """One BFS round. Returns the next frontier's row count."""
        cfg = self.cfg
        t0 = time.monotonic()

        # R5: skip anything already done (re-discovered seeds)
        done_keys = self.store.read("results").select("url_norm")
        eligible = frontier_r.join(done_keys, "url_norm", "left_anti")

        # S4/G4: robots
        self._ensure_robots(eligible)
        allowed = can_fetch_filter(eligible, self._robots, cfg)

        # G5: per-host politeness budget
        scheduled, deferred = schedule_budget(allowed, self._delays, cfg)
        scheduled = scheduled.persist()
        deferred = deferred.persist()

        # rebalance the fetch stage on url_hash — hot hosts spread
        # uniformly (north-rule salted repartition, BASELINE.json:6)
        n_parts = (cfg.shuffle_partitions
                   or self.spark.sparkContext.defaultParallelism)
        fetch_in = scheduled.repartition(n_parts, F.col("url_hash"))

        fetched = self.fetcher(fetch_in).persist()

        cls = status_class_expr(F.col("status"))
        mime_ok = mime_ok_expr(F.col("content_type"), cfg.mime_types)
        done_cond = (cls == 2) | (
            (cls == 3) & F.lit(cfg.record_redirects)
            & F.col("redirect_location").isNotNull())

        results_new = fetched.filter(done_cond).select(
            "url_norm", "status", "content_type",
            mime_ok.alias("parsed"), "depth",
            F.lit(r).alias("round"), "image_id",
            F.lit(None).cast("string").alias("caption"),
        )
        self.store.append("results", results_new)

        # P1/P2/P3 + F12/F16/F8 + R3: page → candidate child urls
        parse_cond = done_cond & (
            mime_ok | ((cls == 3) & F.lit(cfg.record_redirects)))
        pages = fetched.filter(parse_cond)
        links = explode_links(
            pages, record_redirects=cfg.record_redirects,
            passthrough=("authority", "depth"))
        links = links.withColumn(
            "href_trimmed",
            trim_query_fragment_expr(
                F.col("href_raw"), cfg.trim_query, cfg.trim_fragment))
        links = links.withColumn(
            "url_resolved", resolve(F.col("src_raw"), F.col("href_trimmed")))
        cand = canonicalize_df(
            links.withColumnRenamed("authority", "src_authority"),
            url_col="url_resolved")
        if cfg.same_authority_only:
            cand = cand.filter(F.col("authority") == F.col("src_authority"))

        # R1: within-round dedupe, deterministic min-pick per url_norm
        cand = (
            cand.groupBy("url_norm", "url_hash").agg(
                F.min(F.struct(
                    F.col("url_resolved").alias("url_raw"),
                    F.col("src_url").alias("discovered_from"),
                    (F.col("depth") + 1).alias("depth"),
                    F.col("authority").alias("authority"),
                    F.col("host").alias("host"),
                )).alias("s"))
            .select("url_norm", "url_hash", "s.url_raw", "s.authority",
                    "s.host", "s.depth", "s.discovered_from")
        )

        # R4: global dedupe against seen (bloom prefilter + exact)
        seen_df = self.store.read("seen")
        new = anti_join_seen(cand, seen_df, self.bloom).persist()

        self.store.append("seen", new.select(
            "url_hash", "url_norm",
            host_bucket_expr(F.col("host")).alias("host_bucket"),
            F.lit(r).alias("round_added")))
        next_frontier = new.select(
            "url_norm", "url_raw", "url_hash", "authority", "host",
            "depth", F.lit(0.0).alias("priority"), "discovered_from",
            F.lit(r + 1).alias("round"),
        ).unionByName(
            deferred.withColumn("round", F.lit(r + 1))
        )
        self.store.append("frontier", next_frontier)

        if self.bloom is not None:
            self.bloom.add_df(new)
            self.bloom.save(self._bloom_path)

        # metrics from parquet footers (no extra jobs)
        pend = self.store._pending
        counts = {t: sum(f["rows"] for a in pend.get(t, [])
                         for f in a["lineage"])
                  for t in ("results", "seen", "frontier")}
        metrics = {
            "round": r,
            "done_new": counts["results"],
            "new_urls": counts["seen"],
            "frontier_next": counts["frontier"],
            "wall_secs": time.monotonic() - t0,
        }
        if cfg.checkpoint:
            self.store.commit_snapshot(r, metrics)
        scheduled.unpersist(); deferred.unpersist()
        fetched.unpersist(); new.unpersist()
        return counts["frontier"]

    # ------------------------------------------------------------------ #

    def results(self) -> DataFrame:
        return self.store.read("results")

    def validated_results(self, corpus: DataFrame,
                          psnr_gate_db: float = 40.0) -> DataFrame:
        """Results joined to the image+caption corpus with per-row
        decoded-pixel PSNR + phash + caption validation (the graft's
        payload invariant, BASELINE.json:15; SURVEY.md §1.3)."""
        from simplecrawler_spark.functions.images import validate_corpus_join

        pages = self.results()
        with_imgs = pages.filter(F.col("image_id").isNotNull())
        plain = pages.filter(F.col("image_id").isNull())
        validated = validate_corpus_join(with_imgs, corpus, psnr_gate_db)
        extra = [c for c in validated.columns if c not in plain.columns]
        plain_padded = plain.select(
            "*", *[F.lit(None).cast("double" if c == "psnr_db" else
                         "long" if c == "phash_computed" else "boolean"
                         ).alias(c) for c in extra])
        return validated.unionByName(plain_padded)

    def result_urls(self) -> set[str]:
        """The reference's return shape: Set[str] of normalised urls
        (crawler.py:244-251)."""
        return {row.url_norm
                for row in self.results().select("url_norm").distinct().collect()}

    @classmethod
    def resume(cls, spark: SparkSession, fetcher, root: str,
               cfg: CrawlConfig | None = None) -> "FrontierCrawler":
        """Reopen a killed crawl at its last committed snapshot; calling
        continue_crawl() finishes the remaining rounds exactly."""
        obj = cls(spark, fetcher, cfg, root=root)
        if os.path.exists(obj._bloom_path):
            obj.bloom = BloomSeen.load(obj._bloom_path)
        return obj

    def continue_crawl(self) -> DataFrame:
        """Finish the remaining rounds of a resumed crawl — identical
        final state to an uninterrupted run (north rule: resumable from
        checkpoint, BASELINE.json:14)."""
        last = self.store.latest_round()
        if last is None:
            raise RuntimeError("nothing to resume — no committed snapshot")
        cfg = self.cfg
        if cfg.bloom_enabled and self.bloom is None:
            # sidecar missing → rebuild the filter from the seen table
            self.bloom = BloomSeen(expected_items=max(cfg.bloom_min_items, 1 << 20),
                                   fpp=cfg.bloom_fpp)
            self.bloom.add_df(self.store.read("seen"))
        return self._run_rounds(start_round=last + 1)
