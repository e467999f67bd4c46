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
import shutil
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simplecrawler_spark.config import CrawlConfig
from simplecrawler_spark.functions.canonical import (
    canon_parts, canonicalize_df, url_hash,
)
from simplecrawler_spark.operators.parse import (
    attach_links_canonical, explode_page_links,
)
from simplecrawler_spark.operators.partitioning import repartition_salted
from simplecrawler_spark.operators.politeness import (
    UNLIMITED_BUDGET, apply_global_budget,
    schedule_budget, schedule_budget_join,
)
from simplecrawler_spark.operators.robots import (
    RobotsState, can_fetch_filter, can_fetch_join, fetch_robots_table,
)
from simplecrawler_spark.operators.seen import (
    BloomSeen, anti_join_seen, host_bucket_expr,
)
from simplecrawler_spark.plans import schemas
from simplecrawler_spark.plans.tables import SnapshotStore
from simplecrawler_spark.sources.fetch import mime_ok_expr, status_class_expr


_LOG_EVENT_ORDER = {"ROBOTS_BLOCKED": 0, "CRAWLING": 1, "VISITED": 2,
                    "FOUND": 3, "ERROR": 4}


def render_crawl_log(log_df: DataFrame,
                     limit: int | None = None) -> list[str]:
    """Render crawl_log rows as the reference's console lines
    (crawler.py:147,152,155,174 prints + the robots line :225).
    Ordered by (round, event, url) — a deterministic serialisation of
    what the reference's thread pool prints in arbitrary interleaving;
    the reference's own CLI test asserts containment, not order
    (tests/test_cli.py:104-143).

    ``limit`` caps the collect at the first N lines of the ordered
    transcript — the sort+limit runs IN Spark (TakeOrdered, no full
    materialisation), so a capped render is scale-safe. An uncapped
    render collects everything: debugging surface only; at scale use
    FrontierCrawler.render_log(rounds=…, limit=…) for partition-pruned
    slices."""
    if limit is not None:
        event_order = F.when(F.col("event") == "ROBOTS_BLOCKED", 0)
        for ev, n in list(_LOG_EVENT_ORDER.items())[1:]:
            event_order = event_order.when(F.col("event") == ev, n)
        event_order = event_order.otherwise(9)
        rows = (log_df
                .orderBy(F.col("round"), event_order, F.col("url"),
                         F.coalesce(F.col("detail"), F.lit("")))
                .limit(limit).collect())
    else:
        rows = sorted(
            log_df.collect(),
            key=lambda x: (x.round, _LOG_EVENT_ORDER.get(x.event, 9),
                           x.url, x.detail or ""))
    lines = []
    for x in rows:
        if x.event == "CRAWLING":
            lines.append(f"CRAWLING: {x.url}")
        elif x.event == "VISITED":
            lines.append(f"VISITED: {x.url}")
        elif x.event == "FOUND":
            lines.append(f"FOUND: {x.url} ON {x.detail}")
        elif x.event == "ERROR":
            lines.append(f"ERROR: {x.detail} ON {x.url}")
        elif x.event == "ROBOTS_BLOCKED":
            lines.append(f"{x.detail} can't crawl {x.url}")
    return lines


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
            "crawl_log": schemas.CRAWL_LOG, "robots": schemas.ROBOTS,
        })
        self.bloom: BloomSeen | None = None
        self._bloom_path = os.path.join(self.root, "sidecar", "bloom.npz")
        # S4 robots state — bounded driver-side view of the persisted
        # robots TABLE (the single source of truth): counters + an
        # authority bloom + caches dropped past the closure/delay
        # limits. The driver never holds every authority's rule text
        # (round-3 verdict item 1).
        self._rstate = RobotsState(
            closure_max=self.cfg.robots_closure_max,
            delay_max=self.cfg.robots_delay_map_max)
        # R5 done-skip state. The ONLY urls that can be both done and
        # re-enter the frontier are seeds (a seed is never added to
        # seen — crawler.py:198-199, SURVEY.md §2.6.1 — so a page
        # linking back to it re-enqueues it once). Two engines
        # (cfg.seed_state_mode): "driver" tracks the handful of seed
        # urls as Python sets — fastest while seeds are few; "table"
        # (round-4 verdict item 4) keeps seeds ONLY in the r0 frontier
        # partition and done-seeds in a parquet sidecar, so the driver
        # holds two COUNTERS and a 10^7+-seed ingest never builds an
        # O(|seeds|) Python set. Joins replace set lookups: done-skip
        # is an anti-join (AQE broadcasts while small), completion is
        # a semi-join appended to the sidecar.
        self._seed_norms: set[str] = set()
        self._done_seeds: set[str] = set()
        # cached done-seed DF for the R5 anti-join: the set stops
        # changing once every seed has fetched (usually after round 0),
        # so rebuilding a driver-side DF per round is wasted serial time
        self._done_seeds_df = None
        self._done_seeds_df_size = -1
        # table-mode seed state: counters + sidecar path only
        self._seed_table_mode = (self.cfg.seed_state_mode == "table")
        self._n_seeds = 0
        self._n_done_seeds = 0
        self._done_seed_dir = os.path.join(self.root, "sidecar",
                                           "done_seeds")
        # S4 robots state: authorities are tracked driver-side
        # ({authority: scheme}), so robots discovery never scans the
        # frontier. New authorities surface from the (persisted,
        # already-small) `new` DF each round — and only when the
        # same-authority filter is off (otherwise none can appear).
        self._auth_pending: dict[str, str] = {}
        # G6 "pagerank" priority: the rank table handle, read once
        if self.cfg.priority_source == "pagerank" \
                and not self.cfg.pagerank_path:
            raise ValueError(
                "priority_source='pagerank' needs cfg.pagerank_path "
                "(a parquet of (v, rank) — see operators/graph.py)")
        if self.cfg.priority_source == "rank" \
                and not self.cfg.rank_table_path:
            raise ValueError(
                "priority_source='rank' needs cfg.rank_table_path "
                "(a parquet with (v, <rank_column>) — e.g. hits()'s "
                "(v, hub, auth) with rank_column='auth')")
        self._pr_df = None
        # concurrent streaming ingest (round-3 verdict item 4): while a
        # crawl executes, ingest_stream micro-batches stage here as
        # standalone parquet dirs — never through store._pending (the
        # round's commit iterates it) — and the next round BOUNDARY
        # sweeps them into that round's own pending appends. Consumed
        # dirs are deleted only after the round's snapshot commits; a
        # crash in between re-sweeps them, where the seen anti-join
        # drops every already-committed url (idempotent, never lossy).
        self._stream_pending_dir = os.path.join(self.root, "stream_pending")
        self._stream_consumed: list[str] = []
        self._crawl_active = False

    # ------------------------------------------------------------------ #

    def _seed_frontier(self, seeds: list[str]) -> DataFrame:
        rows, seen_norm = [], set()
        for s in seeds:
            norm, scheme, authority, host, *_ = canon_parts(s)
            if norm in seen_norm:
                continue  # seed set semantics
            seen_norm.add(norm)
            if authority:
                self._auth_pending.setdefault(authority, scheme or "http")
            rows.append((norm, s, None, authority, host, 0, 0.0, None, 0))
        self._n_seeds = len(rows)
        if not self._seed_table_mode:
            self._seed_norms = seen_norm
        df = self.spark.createDataFrame(rows, schemas.FRONTIER)
        return df.withColumn("url_hash", url_hash(F.col("url_norm")))

    def _seed_frontier_from_df(self, seeds_df: DataFrame,
                               url_col: str = "url_raw") -> DataFrame:
        """Frontier rows from a DataFrame of raw seed urls — the
        10^7+-seed entry (sitemap dumps, prior-crawl exports): the
        seed list NEVER exists driver-side. One Arrow canonicalisation
        pass, min-struct dedupe on url_norm (set semantics, ties to
        the lexicographically-least raw form — deterministic), then
        the frontier projection. Authorities register through the same
        bounded distinct-collect the streaming sweep uses."""
        canon = canonicalize_df(
            seeds_df.where(F.length(F.trim(F.col(url_col))) > 0)
            .withColumn(url_col, F.trim(F.col(url_col))))
        batch = (canon.groupBy("url_norm")
                 .agg(F.min(F.struct(F.col(url_col).alias("url_raw"),
                                     "authority", "host", "scheme"))
                      .alias("s"))
                 .select("url_norm", "s.url_raw", "s.authority",
                         "s.host", "s.scheme"))
        # authorities register the same way the streaming sweep does —
        # a distinct-collect at AUTHORITY grain (robots must be fetched
        # once per authority regardless, so this is the floor, and it
        # is RobotsState-bounded downstream, never O(|seeds|))
        self._register_authorities({
            row.authority: row.scheme or "http"
            for row in (batch.select("authority", "scheme")
                        .where(F.col("authority") != "")
                        .distinct().collect())})
        return batch.select(
            "url_norm", "url_raw", url_hash(F.col("url_norm"))
            .alias("url_hash"), "authority", "host",
            F.lit(0).alias("depth"), F.lit(0.0).alias("priority"),
            F.lit(None).cast("string").alias("discovered_from"),
            F.lit(0).alias("round"))

    # -- table-mode seed state (round-4 verdict item 4) ---------------- #

    def _seed_table(self) -> DataFrame:
        """The seed set AS A TABLE: round-0 frontier url_norms — the
        single source of truth in table mode (nothing driver-side)."""
        return (self.store.read("frontier", partition="r0")
                .where(F.col("round") == 0).select("url_norm").distinct())

    def _read_done_seeds(self) -> DataFrame:
        return self.spark.read.schema("url_norm string").parquet(
            self._done_seed_dir)

    def _append_done_seeds(self, done: DataFrame) -> int:
        """Append newly-completed seed norms to the sidecar; returns
        how many landed (bounded work: at most |seeds| rows EVER cross
        this path, most in round 0)."""
        done = done.select("url_norm").persist()
        n = done.count()
        if n:
            os.makedirs(self._done_seed_dir, exist_ok=True)
            done.coalesce(1).write.mode("append").parquet(
                self._done_seed_dir)
        done.unpersist()
        return n

    def _ensure_robots(self) -> None:
        """Fetch robots.txt for pending authorities. The reference
        fetches robots unconditionally, once per crawl
        (crawler.py:201-203); multi-authority crawls extend that to
        once per authority. Pending authorities are tracked
        driver-side (bounded per round), membership against the
        already-fetched set is the RobotsState protocol (exact cache →
        bloom split + confirm anti-join against the table), and the
        fetched text + its crawl-delay parse stay executor-side: the
        rows append STRAIGHT to the robots table; the driver folds in
        only bounded counters/caches (round-3 verdict item 1)."""
        pending, self._auth_pending = self._auth_pending, {}
        if not pending:
            return
        missing = self._rstate.split_missing(pending,
                                             self.store.read("robots"))
        if not missing:
            return
        rows_df = fetch_robots_table(self.spark, missing, self.fetcher,
                                     self.cfg)
        path = self.store.append("robots", rows_df)
        n_rows = sum(
            f["rows"] for f in self.store._pending["robots"][-1]["lineage"])
        # fold counters/bounded caches from the WRITTEN parquet — the
        # fetch never re-runs, and past the closure limit rule text
        # never crosses back to the driver
        self._rstate.register_fetched(self.spark.read.parquet(path),
                                      missing, n_rows)
        self._rstate.maybe_grow(self.store.read("robots"))
        self._rstate.save(self.store.sidecar("robots_state"))

    def _register_authorities(self, pairs: dict[str, str]) -> None:
        """Queue authorities not PROVEN fetched for the next round's
        robots discovery. Proven-known (cache hit) rows drop here for
        free; past the cache every candidate stays pending and
        _ensure_robots's bloom-split + confirm anti-join supplies the
        exact membership — pending is bounded by one round's distinct
        discoveries either way."""
        for auth, scheme in pairs.items():
            if auth and not self._rstate.known_exact(auth):
                self._auth_pending.setdefault(auth, scheme or "http")

    def _note_new_authorities(self, new: DataFrame) -> None:
        """Collect authorities first seen in this round's `new` rows
        (one small job on an already-persisted DF) — the no-bloom
        fallback; with a bloom the crawl piggybacks this onto the
        filter-build pass (add_df(collect_authorities=True)) and saves
        the job. Skipped entirely when same_authority_only — no new
        authority can appear."""
        if self.cfg.same_authority_only:
            return
        rows = (new.select(
                    "authority",
                    F.split("url_norm", "://").getItem(0).alias("scheme"))
                .where(F.col("authority") != "").distinct().collect())
        self._register_authorities(
            {row.authority: row.scheme for row in rows})

    # ------------------------------------------------------------------ #

    def crawl(self, seeds: str | list[str]) -> DataFrame:
        """Run the BFS fixpoint from ``seeds``; returns the results
        DataFrame (url_norm … — reference returns the done-set as
        strings, crawler.py:244-251)."""
        if isinstance(seeds, str):
            seeds = [seeds]
        cfg = self.cfg
        if (cfg.seed_state_mode == "auto"
                and len(seeds) >= cfg.seed_driver_max):
            self._seed_table_mode = True
        if cfg.bloom_enabled:
            self.bloom = BloomSeen(expected_items=max(cfg.bloom_min_items, cfg.bloom_initial_capacity),
                                   fpp=cfg.bloom_fpp)
        self.store.append("frontier", self._seed_frontier(seeds),
                          partition="r0")
        return self._run_rounds(start_round=0)

    def crawl_df(self, seeds_df: DataFrame,
                 url_col: str = "url_raw") -> DataFrame:
        """Run the BFS fixpoint from a DataFrame of raw seed urls —
        the sitemap-scale entry (round-4 verdict item 4): seeds are
        canonicalised, deduped and staged entirely as DataFrames, the
        R5 seed state runs in table mode (counters + sidecar, no
        O(|seeds|) Python set), and the driver never sees a url.
        Identical final state to crawl() on the same seed set."""
        cfg = self.cfg
        if cfg.seed_state_mode != "driver":
            self._seed_table_mode = True
        if cfg.bloom_enabled:
            self.bloom = BloomSeen(expected_items=max(cfg.bloom_min_items, cfg.bloom_initial_capacity),
                                   fpp=cfg.bloom_fpp)
        fr = self._seed_frontier_from_df(seeds_df, url_col=url_col)
        self.store.append("frontier", fr, partition="r0")
        if self._seed_table_mode:
            self._n_seeds = self._seed_table().count()
        else:
            self._seed_norms = {r.url_norm for r in
                                self._seed_table().collect()}
            self._n_seeds = len(self._seed_norms)
        return self._run_rounds(start_round=0)

    def _run_rounds(self, start_round: int) -> DataFrame:
        cfg = self.cfg
        r = start_round
        row_count = None  # frontier row count, known from the prior round
        self._crawl_active = True
        try:
            while r < cfg.max_rounds:
                # round-boundary pickup of concurrently-streamed seeds
                # (ingest_stream): staged batches join round r's
                # frontier partition as ordinary pending appends, so
                # the round's OWN snapshot commits them (a driver
                # listdir when nothing is staged — free)
                swept = self._sweep_stream_pending(r)
                if row_count == 0 and swept == 0:
                    break  # R7/R8 fixpoint: nothing new, nothing streamed
                # partition-pruned scan: only round r's data dirs are
                # read (the .where is a pushed-down guard for untagged
                # dirs)
                frontier_r = (self.store.read("frontier",
                                              partition=f"r{r}")
                              .where(F.col("round") == r))
                if row_count is None and swept == 0 \
                        and frontier_r.isEmpty():
                    # only the entry round needs an emptiness probe —
                    # every later round's count comes back from
                    # _round() itself (+ the sweep's exact footer count)
                    break
                hint = (None if row_count is None
                        else row_count + swept)
                next_count = self._round(frontier_r, r, hint)
                # commit_snapshot(r) has run — the swept batches are
                # durable in the manifest; drop their staged files
                self._drop_consumed_stream_dirs()
                # opt-in table maintenance on a round cadence: compact
                # the ever-growing membership tables AFTER the round's
                # commit (pending is empty, so this only rewrites
                # durable dirs; the swap itself becomes durable with
                # the NEXT round's commit — a crash in between replays
                # from the uncompacted manifest, losing nothing)
                if cfg.compact_every and (r + 1) % cfg.compact_every == 0:
                    # merge_partitions: seen/results tag dirs by the
                    # round that WROTE them, but are never pruned-read
                    # by tag (the round lives in a column), so the
                    # cross-round merge is what shrinks the scan
                    for t in ("seen", "results"):
                        self.store.compact(t, merge_partitions=True)
                row_count = next_count
                r += 1
        finally:
            self._crawl_active = False
        return self.results()

    def _sweep_stream_pending(self, r: int) -> int:
        """Ingest every COMPLETE staged stream batch (dir with a
        _SUCCESS marker — Spark writes it last, so a batch the sink is
        writing right now is skipped and picked up next round) into
        round ``r``'s frontier partition, exactly like the between-
        crawls direct path: cross-batch dedupe, seen anti-join, seen +
        bloom insertion, authority registration. Returns the exact
        post-anti-join row count (parquet footers — no count() job).
        Appends land in store._pending from THIS (the loop) thread
        only; the streaming thread never touches the store mid-crawl."""
        if not os.path.isdir(self._stream_pending_dir):
            return 0
        dirs = sorted(
            d for d in (os.path.join(self._stream_pending_dir, n)
                        for n in os.listdir(self._stream_pending_dir))
            if os.path.exists(os.path.join(d, "_SUCCESS")))
        if not dirs:
            return 0
        batch = self.spark.read.parquet(*dirs)
        # cross-batch dedupe: the direct path gets this from per-batch
        # seen insertion; swept batches land together, so dedupe here
        # (deterministic min-struct pick, same discipline as R1)
        batch = (batch.groupBy("url_norm")
                 .agg(F.min(F.struct("url_raw", "authority", "host"))
                      .alias("s"))
                 .select("url_norm", "s.url_raw", "s.authority",
                         "s.host"))
        rows = batch.select(
            "url_norm", "url_raw",
            url_hash(F.col("url_norm")).alias("url_hash"),
            "authority", "host",
            F.lit(0).alias("depth"), F.lit(0.0).alias("priority"),
            F.lit(None).cast("string").alias("discovered_from"),
            F.lit(r).alias("round"),
        )
        new = anti_join_seen(rows, self.store.read("seen"),
                             self.bloom).persist()
        self.store.append("frontier", new, partition=f"r{r}")
        self.store.append("seen", new.select(
            "url_hash", "url_norm",
            host_bucket_expr(F.col("host")).alias("host_bucket"),
            F.lit(r).alias("round_added")), partition=f"r{r}")
        if self.bloom is not None:
            self.bloom.add_df(new)
            self._sync_bloom_membership()
        self._register_authorities({
            row.authority: row.scheme or "http"
            for row in (new.select(
                            "authority",
                            F.split("url_norm", "://").getItem(0)
                            .alias("scheme"))
                        .where(F.col("authority") != "")
                        .distinct().collect())})
        new.unpersist()
        self._stream_consumed.extend(dirs)
        pend = self.store._pending.get("frontier", [])
        return sum(f["rows"] for f in pend[-1]["lineage"])

    def _drop_consumed_stream_dirs(self) -> None:
        """Delete staged stream batches the just-committed round
        ingested. Only called after commit_snapshot succeeds; dirs
        surviving a crash are re-swept harmlessly (see __init__)."""
        dirs, self._stream_consumed = self._stream_consumed, []
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)

    def _round(self, frontier_r: DataFrame, r: int,
               row_count: int | None = None) -> int:
        """One BFS round. Returns the next frontier's row count.

        Owns the round's driver-thread pool lifecycle: any exception in
        the body still awaits the submitted background writes (so no
        append keeps running past the round) and observes their
        exceptions before the pool is torn down."""
        pool = ThreadPoolExecutor(max_workers=2)
        futures: list = []
        self._in_round = True
        try:
            return self._round_body(frontier_r, r, row_count, pool, futures)
        finally:
            self._in_round = False
            pool.shutdown(wait=True)
            for f in futures:
                if f.done() and not f.cancelled():
                    f.exception()  # observe background failures

    def _round_body(self, frontier_r: DataFrame, r: int,
                    row_count: int | None, pool: ThreadPoolExecutor,
                    futures: list) -> int:
        cfg = self.cfg
        t0 = time.monotonic()
        phases: dict[str, float] = {}
        _prev = [t0]

        def _mark(name: str) -> None:
            now = time.monotonic()
            phases[name] = round(now - _prev[0], 3)
            _prev[0] = now

        # R5: skip anything already done. Only re-discovered seeds can
        # be done-but-in-frontier (see __init__ note), so the done-skip
        # never scans the results table: a literal filter for a few
        # seeds, a broadcast anti-join for many (a large isin-literal
        # list bloats every job's plan and is O(|seeds|) per row).
        # Table mode: anti-join against the done-seed sidecar — AQE
        # broadcasts while it is small; at sitemap scale it is a hash
        # join on the key the frontier already carries.
        if self._seed_table_mode:
            eligible = (frontier_r if not self._n_done_seeds
                        else frontier_r.join(self._read_done_seeds(),
                                             "url_norm", "left_anti"))
        elif not self._done_seeds:
            eligible = frontier_r
        elif len(self._done_seeds) <= 64:
            eligible = frontier_r.filter(
                ~F.col("url_norm").isin(sorted(self._done_seeds)))
        else:
            if self._done_seeds_df_size != len(self._done_seeds):
                if self._done_seeds_df is not None:
                    self._done_seeds_df.unpersist()
                self._done_seeds_df = self.spark.createDataFrame(
                    [(s,) for s in sorted(self._done_seeds)],
                    "url_norm string").persist()
                self._done_seeds_df_size = len(self._done_seeds)
            eligible = frontier_r.join(F.broadcast(self._done_seeds_df),
                                       "url_norm", "left_anti")

        # S4/G4: robots — pending authorities were noted driver-side
        # (seeds at crawl(); discoveries ride on the prior round's
        # bloom-build pass via _register_authorities). Past the
        # closure-broadcast limit, rules are evaluated against the
        # persisted robots TABLE via a relational join instead of the
        # driver-side pandas copy.
        self._ensure_robots()
        _mark("robots_fetch")
        if not cfg.obey_robots or not self._rstate.any_rules:
            # no non-empty rules anywhere → RobotFileParser allows all
            # (crawler.py:191-192 error→empty parity): skip the gate
            allowed = eligible
        elif self._rstate.use_join_gate:
            allowed = can_fetch_join(eligible, self.store.read("robots"),
                                     cfg)
        else:
            allowed = can_fetch_filter(eligible,
                                       self._rstate.robots_frame(), cfg)

        # S5 transcript rows (crawl_log only — one extra anti-join for
        # the robots-blocked complement, zero cost when off)
        log_parts: list[DataFrame] = []
        if cfg.crawl_log:
            blocked = eligible.join(allowed.select("url_norm"),
                                    "url_norm", "left_anti")
            log_parts.append(blocked.select(
                F.lit("ROBOTS_BLOCKED").alias("event"),
                F.col("url_norm").alias("url"),
                F.lit(cfg.user_agent).alias("detail")))

        # G5: per-host politeness budget. scheduled/deferred are each
        # consumed ONCE on the unbudgeted fast path (fetch; next
        # frontier), so caching them is pure overhead — persist only
        # when a second consumer exists (budgeted window recomputation
        # or the crawl_log CRAWLING selector).
        # Past cfg.robots_delay_map_max delay-carrying authorities the
        # literal map stops scaling — the RobotsState drops the dict
        # permanently and the budget derives from a join against the
        # persisted robots table (same counter-keyed switch shape as
        # the robots closure→join gate above).
        if self._rstate.any_delays and self._rstate.use_delay_join:
            scheduled, deferred = schedule_budget_join(
                allowed, self.store.read("robots"), cfg)
        else:
            scheduled, deferred = schedule_budget(
                allowed, self._rstate.delays or {}, cfg)
        scheduled, deferred = apply_global_budget(scheduled, deferred, cfg)
        budgeted = self._rstate.any_delays or (
            cfg.max_per_host_per_round < UNLIMITED_BUDGET) or (
            cfg.max_urls_per_round < UNLIMITED_BUDGET)
        cache_sched = budgeted or cfg.crawl_log
        if cache_sched:
            scheduled = scheduled.persist()
            deferred = deferred.persist()
        if cfg.crawl_log:
            log_parts.append(scheduled.select(
                F.lit("CRAWLING").alias("event"),
                F.col("url_norm").alias("url"),
                F.lit(None).cast("string").alias("detail")))

        # rebalance the fetch stage on url_hash — hot hosts spread
        # uniformly (north-rule salted repartition, BASELINE.json:6).
        # Partition count adapts to the round's known row count so tiny
        # rounds don't fan out into near-empty Python-worker tasks.
        n_parts = (cfg.shuffle_partitions
                   or self.spark.sparkContext.defaultParallelism)
        if row_count is not None:
            n_parts = max(1, min(
                n_parts, -(-row_count // cfg.rows_per_task)))
        fetch_in = repartition_salted(scheduled, n_parts,
                                      salt_buckets=cfg.salt_buckets)

        cls = status_class_expr(F.col("status"))
        mime_ok = mime_ok_expr(F.col("content_type"), cfg.mime_types)
        done_cond = (cls == 2) | (
            (cls == 3) & F.lit(cfg.record_redirects)
            & F.col("redirect_location").isNotNull())
        parse_cond = done_cond & (
            mime_ok | ((cls == 3) & F.lit(cfg.record_redirects)))

        # Fetch AND parse exactly once, fused, straight into a
        # per-round PAGE-grain staging file under the store root
        # (tmpfs here; object store on a cluster): fetch metadata
        # columns plus a `links array<struct>` of the page's
        # trimmed/resolved/canonicalised out-links. Every downstream
        # consumer — results write, transcript, seed check, the
        # dedupe/anti-join chain — is a column-pruned scan of this
        # file. Two measured failure modes died here
        # (BENCH/ROUND3_NOTES.md): (a) the round-2 design cached
        # `fetched` and let the background results write race the
        # parse chain to fill that cache, nondeterministically
        # duplicating the fetch join for 50-400 executor-seconds per
        # incident (the bimodal scaling noise); (b) staging RAW BODIES
        # cost ~40% of crawl wall, since the body's only consumer is
        # the parse — fusing the parse into the staging job means the
        # body streams fetcher→Arrow→HTMLParser inside one stage and
        # never touches storage. Durable staging is also the only
        # fetch-once guarantee (a live HttpFetcher must never re-GET
        # on cache miss) and the only handoff that survives executor
        # loss.
        stage_dir = os.path.join(self.store.root, "stage", f"fetched-r{r}")
        # mode=overwrite: a crash between this write and the round's
        # snapshot commit leaves the stage dir behind (unlike table
        # appends, which go to fresh uuid dirs the manifest never
        # references); the resumed round REPLAYS round r and must be
        # able to clobber the orphan instead of dying on path-exists
        attach_links_canonical(
            self.fetcher(fetch_in).withColumn(
                "_parse", F.coalesce(parse_cond, F.lit(False))),
            trim_query=cfg.trim_query, trim_fragment=cfg.trim_fragment,
            record_redirects=cfg.record_redirects,
            with_found=cfg.crawl_log,
            extractor=cfg.link_extractor,
        ).write.mode("overwrite").parquet(stage_dir)
        fetched = self.spark.read.parquet(stage_dir)
        _mark("fetch_stage")

        results_new = fetched.filter(done_cond).select(
            "url_norm", "status", "content_type",
            mime_ok.alias("parsed"), "depth",
            F.lit(r).alias("round"), "image_id",
            F.lit(None).cast("string").alias("caption"),
        )
        # overlap #1: the results write is a body-pruned scan of the
        # staged fetch file — submit it as a concurrent driver-thread
        # job instead of a barrier (file reads, unlike cold-cache
        # fills, are safe to overlap)
        fut_results = pool.submit(self.store.append, "results",
                                  results_new, f"r{r}")
        futures.append(fut_results)
        if cfg.crawl_log:
            # VISITED covers wrong-MIME 2xx pages too (reference
            # WrongMIMEType branch, crawler.py:176-180); ERROR is the
            # 4xx/5xx branch (:168-174)
            log_parts.append(fetched.filter(done_cond).select(
                F.lit("VISITED").alias("event"),
                F.col("url_norm").alias("url"),
                F.lit(None).cast("string").alias("detail")))
            log_parts.append(fetched.filter((cls == 4) | (cls == 5)).select(
                F.lit("ERROR").alias("event"),
                F.col("url_norm").alias("url"),
                F.col("status").cast("string").alias("detail")))
        _mark("results_submit")

        # R5 upkeep: record which seeds completed this round (a seed
        # that errored stays pending and is refetchable if
        # re-discovered — exact reference semantics, crawler.py:168-174)
        if self._seed_table_mode:
            # completion via joins, counters only: new done = this
            # round's done fetches ∩ seed table ∖ already-done. At
            # most |seeds| rows EVER cross this append, nearly all in
            # round 0; once the counters agree the check is free.
            if self._n_done_seeds < self._n_seeds:
                new_done = (fetched.filter(done_cond)
                            .join(self._seed_table(), "url_norm",
                                  "left_semi"))
                if self._n_done_seeds:
                    new_done = new_done.join(self._read_done_seeds(),
                                             "url_norm", "left_anti")
                self._n_done_seeds += self._append_done_seeds(new_done)
        else:
            pending_seeds = self._seed_norms - self._done_seeds
            if pending_seeds and len(pending_seeds) <= 64:
                hit = (fetched.filter(
                        F.col("url_norm").isin(sorted(pending_seeds)))
                       .filter(done_cond).select("url_norm").collect())
                self._done_seeds.update(row.url_norm for row in hit)
            elif pending_seeds:
                pend_df = self.spark.createDataFrame(
                    [(s,) for s in sorted(pending_seeds)],
                    "url_norm string")
                hit = (fetched.join(F.broadcast(pend_df), "url_norm",
                                    "left_semi")
                       .filter(done_cond).select("url_norm").collect())
                self._done_seeds.update(row.url_norm for row in hit)
        _mark("seed_check")

        # P1/P2/P3 + F12/F16/F8 + R3: the parse already ran inside the
        # staging job — link rows are a pruned scan + explode of the
        # staged `links` column (no Python stage, no persist)
        cand = explode_page_links(fetched, with_found=cfg.crawl_log)
        if cfg.crawl_log:
            log_parts.append(cand.select(
                F.lit("FOUND").alias("event"),
                F.col("href_norm").alias("url"),
                F.col("src_url").alias("detail")))
            self.store.append("crawl_log", self._log_df(log_parts, r),
                              partition=f"r{r}")
            cand = cand.drop("href_norm")
        if cfg.same_authority_only:
            cand = cand.filter(F.col("authority") == F.col("src_authority"))
        if cfg.trap_filter:
            # frontier hygiene (operators/traps.py): one more narrow
            # JVM predicate in the same codegen span — trapped urls
            # are gone before the dedupe shuffle and the seen set
            from simplecrawler_spark.operators.traps import (
                url_trap_flags,
            )
            cand = cand.filter(
                ~url_trap_flags(F.col("url_norm"))["is_trap"])
        cand = cand.withColumn("url_hash", url_hash(F.col("url_norm")))

        # R1: within-round dedupe, deterministic min-pick per url_norm.
        # The same aggregate yields the in-degree (discovery count) —
        # G6's priority signal — for free: no extra shuffle.
        cand = (
            cand.groupBy("url_norm", "url_hash").agg(
                F.min(F.struct(
                    F.col("url_resolved").alias("url_raw"),
                    F.col("src_url").alias("discovered_from"),
                    (F.col("depth") + 1).alias("depth"),
                    F.col("authority").alias("authority"),
                    F.col("host").alias("host"),
                )).alias("s"),
                F.count("*").alias("n_disc"))
            .select("url_norm", "url_hash", "s.url_raw", "s.authority",
                    "s.host", "s.depth", "s.discovered_from", "n_disc")
        )
        # cand is consumed twice by the bloom-split anti-join (the
        # definitely-new branch and the maybe-seen semi/anti pair) —
        # cache it so the Python parse chain runs exactly once
        cand = cand.persist()

        # R4: global dedupe against seen (bloom prefilter + exact).
        # New-authority discovery is NOT a separate job here — it rides
        # on the bloom build below (or the no-bloom fallback).
        seen_df = self.store.read("seen")
        new = anti_join_seen(cand, seen_df, self.bloom)
        _mark("parse_canon_antijoin")

        # G6: priority signal for next round's scheduling ORDER BY
        # (asc — more negative → earlier under budget). All sources
        # derive from columns the R1 aggregate already produced;
        # hostrank adds one window shuffle on host — the same key the
        # politeness window shuffles on anyway.
        if cfg.priority_source == "indegree":
            priority = (-F.col("n_disc")).cast("double")
        elif cfg.priority_source == "hostrank":
            from pyspark.sql import Window
            priority = (-F.sum("n_disc").over(
                Window.partitionBy("host"))).cast("double")
        elif cfg.priority_source == "depth":
            priority = F.col("depth").cast("double")
        elif cfg.priority_source in ("pagerank", "rank"):
            # offline rank table (operators/graph.py pagerank/hits, or
            # any (v, score) parquet) joined on at discovery time: one
            # left join per round of the (small, already-anti-joined)
            # new frontier onto the precomputed table. Unranked urls —
            # pages no prior crawl saw — score 0, i.e. schedule after
            # every ranked page.
            ranks = self._rank_table()
            new = new.join(ranks, new["url_norm"] == ranks["_pr_v"],
                           "left").drop("_pr_v")
            priority = (-F.coalesce(F.col("_pr_rank"), F.lit(0))
                        ).cast("double")
        else:  # "fifo"
            priority = F.lit(0.0)

        # THE round's single materialisation of the expensive tail
        # (fused parse → dedupe shuffle → bloom split → anti-join):
        # straight into the next frontier's parquet. Seen rows, the
        # bloom build, and authority discovery all re-derive from this
        # columnar file via column-pruned scans. Relying on the
        # executor cache here instead (round-2 design: new.persist()
        # consumed by three jobs) was measured to nondeterministically
        # re-run the membership-UDF/anti-join tail or stall on cache
        # block locks — ~340 duplicate executor-seconds per big round
        # at 1M pages. A durable staged file is also the only version
        # of this handoff that survives executor loss on a real
        # cluster; cache does not.
        next_new = new.select(
            "url_norm", "url_raw", "url_hash", "authority", "host",
            "depth", priority.alias("priority"), "discovered_from",
            F.lit(r + 1).alias("round"),
        )
        new_dir = self.store.append("frontier", next_new, f"r{r + 1}")
        new_count = sum(
            f["rows"]
            for f in self.store._pending["frontier"][-1]["lineage"])
        newf = (self.spark.read.parquet(new_dir) if new_count
                else None)
        _mark("frontier_write")

        # overlap #2: the seen append is a pruned scan of the staged
        # file — run it in a driver thread while the bloom (same
        # input) updates in the main thread
        if newf is not None:
            fut_seen = pool.submit(
                self.store.append, "seen", newf.select(
                    "url_hash", "url_norm",
                    host_bucket_expr(F.col("host")).alias("host_bucket"),
                    F.lit(r).alias("round_added")), f"r{r}")
            futures.append(fut_seen)
        else:
            fut_seen = None

        # deferred rows re-enter the frontier as their own (small)
        # append; on the unbudgeted fast path deferred is empty by
        # construction — skip the job entirely
        defer_count = 0
        if budgeted:
            self.store.append(
                "frontier",
                deferred.withColumn("round", F.lit(r + 1)).select(
                    *next_new.columns),
                partition=f"r{r + 1}")
            defer_count = sum(
                f["rows"]
                for f in self.store._pending["frontier"][-1]["lineage"])

        if self.bloom is not None:
            if newf is not None:
                auths = self.bloom.add_df(
                    newf, row_count=new_count,
                    collect_authorities=not cfg.same_authority_only)
                if auths:
                    self._register_authorities(auths)
            if self.bloom.saturated():
                # amortised doubling: rebuild 4x bigger from the seen
                # table (one distributed pass; O(1) per URL overall).
                # The rebuild reads the seen TABLE, so this round's
                # background seen append must land first — otherwise
                # the new filter misses round-r URLs and a Bloom false
                # negative becomes a duplicate crawl.
                if fut_seen is not None:
                    fut_seen.result()
                self.bloom = BloomSeen(
                    expected_items=self.bloom.added * 4,
                    fpp=cfg.bloom_fpp)
                self.bloom.add_df(self.store.read("seen"))
            _mark("bloom_add")
            self.bloom.save(self._bloom_path)
            self._sync_bloom_membership()
            _mark("bloom_save")
        elif newf is not None:
            self._note_new_authorities(newf)
        if fut_seen is not None:
            fut_seen.result()
        fut_results.result()
        _mark("write_join")

        # row counts from parquet footers (no extra jobs)
        pend = self.store._pending
        counts = {t: sum(f["rows"] for a in pend.get(t, [])
                         for f in a["lineage"])
                  for t in ("results", "seen", "frontier")}
        metrics = {
            "round": r,
            "done_new": counts["results"],
            "new_urls": counts["seen"],
            "frontier_next": new_count + defer_count,
            "wall_secs": time.monotonic() - t0,
            "phases": phases,
        }
        if cfg.checkpoint:
            self.store.commit_snapshot(r, metrics)
        if cache_sched:
            scheduled.unpersist(); deferred.unpersist()
        cand.unpersist()
        shutil.rmtree(stage_dir, ignore_errors=True)
        return new_count + defer_count

    def _log_df(self, parts: list[DataFrame], r: int) -> DataFrame:
        """Union the round's transcript fragments into CRAWL_LOG rows."""
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.select(F.lit(r).alias("round"), "event", "url", "detail")

    def crawl_log(self) -> DataFrame:
        """S5: the per-URL event log table (requires cfg.crawl_log)."""
        return self.store.read("crawl_log")

    def render_log(self, rounds: int | list[int] | None = None,
                   limit: int | None = None) -> list[str]:
        """Scale-safe transcript rendering (round-2 verdict item 5):
        reads ONLY the requested rounds' crawl_log partitions
        (file-pruned — other rounds' data dirs are never opened) and
        optionally caps the collect at ``limit`` ordered lines. The
        full-table render_crawl_log stays for tests/debugging."""
        if rounds is None:
            df = self.store.read("crawl_log")
        else:
            if isinstance(rounds, int):
                rounds = [rounds]
            df = None
            for k in rounds:
                part = (self.store.read("crawl_log", partition=f"r{k}")
                        .where(F.col("round") == k))
                df = part if df is None else df.unionByName(part)
            if df is None:
                return []
        return render_crawl_log(df, limit=limit)

    def _sync_bloom_membership(self) -> None:
        """Pick the membership path for the CURRENT filter size
        (cfg.bloom_membership): write/refresh the per-bucket bitset
        sidecar and arm co-partitioned evaluation, or stay on the
        cached broadcast while the filter is small."""
        if self.bloom is None:
            return
        total = self.bloom.n_buckets * (self.bloom.m // 8)
        cfg = self.cfg
        use_sidecar = cfg.bloom_membership == "sidecar" or (
            cfg.bloom_membership == "auto"
            and total >= cfg.bloom_sidecar_min_bytes)
        if use_sidecar:
            self.bloom.save_buckets(self.store.sidecar("bloom_buckets"))
        else:
            self.bloom.sidecar_dir = None

    # ------------------------------------------------------------------ #

    def results(self) -> DataFrame:
        return self.store.read("results")

    def _rank_table(self) -> DataFrame:
        """The precomputed rank table for priority_source "pagerank"
        ((v, rank) at cfg.pagerank_path) or "rank" ((v, cfg.
        rank_column) at cfg.rank_table_path — hits()'s auth/hub, a
        prior pagerank, any offline score), read once per crawler and
        column-renamed so the per-round left join never collides with
        frontier columns."""
        if self._pr_df is None:
            if self.cfg.priority_source == "rank":
                path, col = self.cfg.rank_table_path, self.cfg.rank_column
            else:
                path, col = self.cfg.pagerank_path, "rank"
            self._pr_df = (
                self.spark.read.parquet(path)
                .select(F.col("v").cast("string").alias("_pr_v"),
                        F.col(col).cast("long").alias("_pr_rank")))
        return self._pr_df

    def link_edges(self) -> DataFrame:
        """The crawl's hyperlink edge set (src, dst) for offline
        PageRank (operators/graph.py pagerank; feed its output back
        via cfg.pagerank_path on the next crawl). With the crawl_log
        sink on, every FOUND event contributes — the full discovery
        multigraph (pagerank distinct-s parallel edges). Without it,
        the frontier's first-discovery edges: a spanning subgraph of
        the link graph — a weaker but well-defined rank signal, and
        the only edge set a log-less 10^10-URL crawl retains."""
        if self.cfg.crawl_log:
            log = self.store.read("crawl_log")
            return (log.where(F.col("event") == "FOUND")
                    .select(F.col("detail").alias("src"),
                            F.col("url").alias("dst")))
        fr = self.store.read("frontier")
        return (fr.where(F.col("discovered_from").isNotNull())
                .select(F.col("discovered_from").alias("src"),
                        F.col("url_norm").alias("dst")))

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

    # ------------------------------------------------------------------ #
    # Expiry / recrawl (engine-new: BASELINE.json:14 "cuckoo-filter
    # fallback for deletions"; the reference resets ALL state per crawl,
    # crawler.py:244-251 — per-URL TTL has no reference analogue)
    # ------------------------------------------------------------------ #

    def attach_cuckoo(self, capacity: int = 1 << 20) -> "object":
        """Attach a sidecar-backed cuckoo filter mirroring the current
        seen table (deletion support for expire_seen). Shard tables
        live as one file per shard under the snapshot sidecar
        (operators/seen.py CuckooSeen.save_shards), so bulk add/delete
        stream shard files executor-side — no broadcast, no table
        bytes through the driver (round-2 verdict item 1)."""
        from simplecrawler_spark.operators.seen import CuckooSeen

        cf = CuckooSeen(capacity=capacity)
        cf.save_shards(self.store.sidecar("cuckoo_shards"))
        seen = self.store.read("seen")
        if not seen.isEmpty():
            cf.add_df(seen)
        self.cuckoo = cf
        return cf

    def expire_seen(self, before_round: int) -> DataFrame:
        """Drop seen entries added before ``before_round`` so those
        urls become crawlable again (TTL/recrawl).

        The seen table is overwritten with the kept rows (snapshot
        history keeps the old state). The Bloom sidecar cannot delete,
        so it is rebuilt from the kept rows (distributed add); a
        CuckooSeen sidecar — when attached as ``self.cuckoo`` — takes
        the cheap path instead: per-key deletes, no rebuild. Returns
        the expired rows.
        """
        seen = self.store.read("seen")
        expired = seen.where(F.col("round_added") < before_round).persist()
        kept = seen.where(F.col("round_added") >= before_round)
        self.store.overwrite("seen", kept)
        if getattr(self, "cuckoo", None) is not None:
            self.cuckoo.delete_df(expired)
        if self.bloom is not None:
            self.bloom = BloomSeen(
                expected_items=max(self.cfg.bloom_min_items, self.cfg.bloom_initial_capacity),
                fpp=self.cfg.bloom_fpp)
            self.bloom.add_df(self.store.read("seen"))
            self.bloom.save(self._bloom_path)
            self._sync_bloom_membership()
        return expired

    def requeue(self, urls: DataFrame) -> int:
        """Re-enqueue previously-expired urls for the next round (their
        next fetch re-adds them to seen/results). Rows need the
        frontier columns url_norm/url_hash/authority/host; depth and
        provenance restart at 0/None."""
        next_round = (self.store.latest_round() or 0) + 1
        if "authority" in urls.columns:
            authority = F.col("authority")
        else:  # seen rows carry only the canonical url — re-derive.
            # Anchor on the FIRST '://' (a kept query/path may embed a
            # url, e.g. ?to=http://x/y with trim_query=False); in a
            # canonical url the authority then runs to the first
            # '/', '?' or '#'.
            authority = F.regexp_extract(
                F.col("url_norm"), r"^[^:/?#]+://([^/?#]*)", 1)
        host = (F.col("host") if "host" in urls.columns
                else F.substring_index(authority, "@", -1))
        rows = urls.select(
            "url_norm", F.lit(None).cast("string").alias("url_raw"),
            "url_hash",
            authority.alias("authority"), host.alias("host"),
            F.lit(0).alias("depth"), F.lit(0.0).alias("priority"),
            F.lit(None).cast("string").alias("discovered_from"),
            F.lit(next_round).alias("round"),
        )
        self.store.append("frontier", rows, partition=f"r{next_round}")
        pend = self.store._pending.get("frontier", [])
        return sum(f["rows"] for f in pend[-1]["lineage"])

    def ingest_stream(self, source_dir: str, checkpoint_dir: str,
                      available_now: bool = True):
        """Structured-Streaming seed ingestion THROUGH the crawler's
        state (round-2 ADVICE: raw stream_seeds staging bypassed
        driver-side state — streamed authorities got no robots fetch,
        and streamed norms were refetchable via later links, breaking
        the R5 done-skip invariant).

        Each micro-batch of canonicalised, stream-deduped urls is
        treated exactly like a round's discovered links
        (crawler.py:160-163 — enqueue ⇒ enter seen):
          * anti-joined against the seen table (bloom-prefiltered), so
            an already-seen url is never re-enqueued;
          * appended to BOTH the next frontier partition and the seen
            table, and added to the bloom sidecar;
          * its authorities registered driver-side so the next round
            fetches their robots.txt before any fetch of theirs.
        foreachBatch runs on the driver, so mutating crawler state here
        is safe. Returns the StreamingQuery.

        Durability + round placement (round-2 ADVICE, medium): the
        target round is computed PER BATCH from the last committed
        snapshot (not once at stream start), and each micro-batch
        commits a snapshot after its appends — so a crash after the
        streaming checkpoint advances can no longer lose appends the
        checkpoint will never replay, and a long-lived stream keeps
        landing seeds in the round the next crawl actually reads.
        Concurrent ingest (round-3 verdict item 4): the per-batch
        commit flushes ALL pending appends, so committing from the
        streaming thread while a crawl executes would flush (or race
        and silently drop — commit_snapshot's read-then-clear of
        _pending is not atomic against a concurrent append) the
        round's partial state. While a crawl is active the sink
        therefore STAGES the batch as a standalone parquet dir under
        <root>/stream_pending instead, and the crawl loop sweeps
        staged batches into the next round boundary's own pending
        appends (_sweep_stream_pending) — committed by that round's
        snapshot, never by this thread. Durability holds in every
        crash window: staged-but-unswept dirs survive on disk and are
        swept on resume; swept-but-uncommitted appends are manifest
        orphans whose staged dirs are only deleted AFTER the commit,
        so the re-sweep's seen anti-join replays them exactly."""
        import uuid as _uuid

        from simplecrawler_spark.streaming.ingest import (
            canonical_seed_stream,
        )

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            if self._crawl_active or getattr(self, "_in_round", False):
                dest = os.path.join(self._stream_pending_dir,
                                    f"batch-{_uuid.uuid4().hex[:12]}")
                (batch_df.select("url_norm", "url_raw", "authority",
                                 "host")
                 .write.mode("errorifexists").parquet(dest))
                return
            rnd = (self.store.latest_round() or 0) + 1
            rows = batch_df.select(
                "url_norm", "url_raw",
                url_hash(F.col("url_norm")).alias("url_hash"),
                "authority", "host",
                F.lit(0).alias("depth"), F.lit(0.0).alias("priority"),
                F.lit(None).cast("string").alias("discovered_from"),
                F.lit(rnd).alias("round"),
            )
            new = anti_join_seen(rows, self.store.read("seen"),
                                 self.bloom).persist()
            self.store.append("frontier", new, partition=f"r{rnd}")
            self.store.append("seen", new.select(
                "url_hash", "url_norm",
                host_bucket_expr(F.col("host")).alias("host_bucket"),
                F.lit(rnd).alias("round_added")), partition=f"r{rnd}")
            if self.bloom is not None:
                self.bloom.add_df(new)
                self._sync_bloom_membership()
            self._register_authorities({
                row.authority: row.scheme or "http"
                for row in (new.select(
                                "authority",
                                F.split("url_norm", "://").getItem(0)
                                .alias("scheme"))
                            .where(F.col("authority") != "")
                            .distinct().collect())})
            pend = self.store._pending.get("frontier", [])
            n_new = (sum(f["rows"] for f in pend[-1]["lineage"])
                     if pend else 0)
            # durable per-batch commit: the snapshot round stays at the
            # last crawl round (rnd - 1), so later batches land in the
            # same next-round partition and continue_crawl resumes at it
            self.store.commit_snapshot(rnd - 1, {
                "stream_batch": int(batch_id),
                "stream_new_urls": n_new,
            })
            new.unpersist()

        writer = (canonical_seed_stream(self.spark, source_dir).writeStream
                  .foreachBatch(sink)
                  .option("checkpointLocation", checkpoint_dir))
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    @classmethod
    def resume(cls, spark: SparkSession, fetcher, root: str,
               cfg: CrawlConfig | None = None) -> "FrontierCrawler":
        """Reopen a killed crawl at its last committed snapshot; calling
        continue_crawl() finishes the remaining rounds exactly."""
        obj = cls(spark, fetcher, cfg, root=root)
        if os.path.exists(obj._bloom_path):
            try:
                obj.bloom = BloomSeen.load(obj._bloom_path)
            except ValueError:
                # sidecar written under an incompatible position scheme
                # (a cross-scheme load would false-negative ⇒ duplicate
                # crawls) — drop it; continue_crawl rebuilds from the
                # seen table exactly as for a missing sidecar
                obj.bloom = None
        cuckoo_io = obj.store.sidecar("cuckoo_shards")
        if cuckoo_io.exists("manifest.json"):
            from simplecrawler_spark.operators.seen import CuckooSeen
            obj.cuckoo = CuckooSeen.load_shards(cuckoo_io)
        return obj

    def continue_crawl(self) -> DataFrame:
        """Finish the remaining rounds of a resumed crawl — identical
        final state to an uninterrupted run (north rule: resumable from
        checkpoint, BASELINE.json:14)."""
        last = self.store.latest_round()
        if last is None:
            raise RuntimeError("nothing to resume — no committed snapshot")
        cfg = self.cfg
        # recover the R5 seed state from the checkpoint (two tiny jobs,
        # once per resume): seeds = round-0 frontier; done = those
        # already present in results
        seed_df = self._seed_table()
        n_seed_rows = (None if self._seed_table_mode
                       else seed_df.count())
        if self._seed_table_mode or (
                cfg.seed_state_mode == "auto"
                and n_seed_rows >= cfg.seed_driver_max):
            # table-mode resume: counters from two joins, the
            # done-seed sidecar rebuilt from results ∩ seeds — no
            # O(|seeds|) collect anywhere
            self._seed_table_mode = True
            self._n_seeds = (n_seed_rows if n_seed_rows is not None
                             else seed_df.count())
            shutil.rmtree(self._done_seed_dir, ignore_errors=True)
            done = (self.store.read("results")
                    .join(seed_df, "url_norm", "left_semi")
                    .select("url_norm").distinct())
            self._n_done_seeds = self._append_done_seeds(done)
        else:
            self._seed_norms = {row.url_norm
                                for row in seed_df.collect()}
            if self._seed_norms:
                sdf = self.spark.createDataFrame(
                    [(s,) for s in sorted(self._seed_norms)],
                    "url_norm string")
                done = (self.store.read("results")
                        .join(F.broadcast(sdf), "url_norm", "left_semi")
                        .select("url_norm").distinct().collect())
                self._done_seeds = {row.url_norm for row in done}
        # rebuild the BOUNDED robots view from the persisted table —
        # one aggregate for the counters, caches only within their
        # limits, authority bloom from the sidecar (else a distributed
        # rebuild); a resume re-reads, never re-fetches, and never
        # materialises the full text column driver-side. Then re-note
        # the resume frontier's authorities so any NOT yet fetched get
        # picked up by _ensure_robots.
        self._rstate = RobotsState.from_table(
            self.store.read("robots"),
            sidecar=self.store.sidecar("robots_state"),
            closure_max=cfg.robots_closure_max,
            delay_max=cfg.robots_delay_map_max)
        resume_frontier = (self.store.read("frontier",
                                           partition=f"r{last + 1}")
                           .where(F.col("round") == last + 1))
        for row in (resume_frontier.select(
                        "authority",
                        F.split("url_norm", "://").getItem(0).alias("scheme"))
                    .where(F.col("authority") != "").distinct().collect()):
            self._auth_pending.setdefault(row.authority,
                                          row.scheme or "http")
        if cfg.bloom_enabled and self.bloom is None:
            # sidecar missing → rebuild the filter from the seen table
            self.bloom = BloomSeen(expected_items=max(cfg.bloom_min_items, cfg.bloom_initial_capacity),
                                   fpp=cfg.bloom_fpp)
            self.bloom.add_df(self.store.read("seen"))
        self._sync_bloom_membership()
        return self._run_rounds(start_round=last + 1)
