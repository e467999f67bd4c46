"""Fetch sources — S2/S3 (SURVEY.md §2.1) + gates G1/G2.

Two implementations behind one interface `fetch(frontier) -> fetched`:

* `TableFetcher` — deterministic fetch against a site_graph DataFrame
  (the test/bench stand-in for the network, FIXTURES.md §1). Redirect
  chains are pre-resolved ONCE into a closure of the (small, static)
  site_graph, so each crawl round's fetch is a single equi-join on
  url_norm instead of a per-round hop loop.
* `HttpFetcher` — real HTTP via `requests` inside mapInPandas (Arrow
  batches; one session per partition). Used only in parity tests
  against the reference's own Flask-style server; the sandbox has no
  outside network.

Reference semantics pinned (requester.py:45-105, crawler.py:112-130):
  - follow_redirects=True (default): the fetched URL keeps its own
    identity; status/content/body come from the redirect target.
  - record_redirects=True: 3xx responses are NOT followed; Location
    becomes the page's only link (crawler.py:120-126).
  - 4xx/5xx → ClientError/ServerError: fetched-but-never-done (G1).
  - MIME gate: allowed iff any allowed mime is a case-insensitive
    substring of Content-Type (requester.py:75-79) (G2).
  - check_head (HEAD probe, requester.py:102-105): a pure cost
    optimisation — results identical; the table fetcher models it by
    the same single join (no body column read for non-HTML rows —
    column pruning gives the HEAD saving for free).
  - unknown host/url → 404 ClientError (what a real server returns for
    an unregistered route in the reference fixture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simplecrawler_spark.config import CrawlConfig
from simplecrawler_spark.functions.canonical import canonicalize, resolve

FETCHED_COLS = [
    "url_norm", "url_raw", "host", "authority", "depth", "priority",
    "round", "status", "content_type", "body", "redirect_location",
    "image_id",
]


def mime_ok_expr(content_type, mime_types) -> F.Column:
    """G2: any allowed mime is a case-insensitive substring of
    Content-Type (requester.py:75-79)."""
    ct = F.lower(F.coalesce(content_type, F.lit("")))
    cond = F.lit(False)
    for m in mime_types:
        cond = cond | ct.contains(m.lower())
    return cond


def status_class_expr(status) -> F.Column:
    """G1: 2xx/3xx/4xx/5xx classification (string-prefix test in the
    reference, requester.py:69-73 — arithmetic here)."""
    return F.floor(status / 100).cast("int")


class TableFetcher:
    """Deterministic fetch = equi-join against the redirect-resolved
    site_graph closure.

    Join strategy is decided ONCE at construction from the closure's
    actual size (one count over the graph, amortised across all
    rounds):

    * small graph → explicit broadcast; every round's fetch is a
      shuffle-free broadcast-hash join.
    * large graph → the closure is hash-partitioned on the join key
      and persisted; each round's left join then only exchanges the
      (small) frontier side — the graph side's partitioning already
      satisfies the join, so it is never shuffled again. (A left-outer
      join cannot broadcast its preserved side, so "just broadcast the
      frontier" is not an option; at real web scale the network
      HttpFetcher replaces this join entirely.)
    """

    def __init__(self, site_graph: DataFrame, cfg: CrawlConfig,
                 broadcast_max_rows: int = 150_000):
        self.cfg = cfg
        self._closure = self._resolve_closure(site_graph, cfg)
        served = self._closure.select(
            F.col("url_norm").alias("g_url_norm"), "status", "content_type",
            "body", "redirect_location", "image_id")
        n_parts = site_graph.sparkSession.sparkContext.defaultParallelism
        self._broadcast = served.count() <= broadcast_max_rows
        if self._broadcast:
            self._served = served
        else:
            # hash-partitioned AND sorted within partitions on the join
            # key: the cached plan reports both outputPartitioning and
            # outputOrdering, so each round's sort-merge join neither
            # exchanges nor re-sorts the graph side
            self._served = (served.repartition(n_parts, F.col("g_url_norm"))
                            .sortWithinPartitions("g_url_norm").persist())
            self._served.count()  # materialise at init, not in round 0

    @staticmethod
    def _ua_gated(graph: DataFrame, cfg: CrawlConfig) -> DataFrame:
        """/user-agent/<name> routes 500 unless the UA matches
        (reference tests/test_crawler.py:75-77)."""
        mismatch = (F.col("ua_required").isNotNull()
                    & (F.col("ua_required") != F.lit(cfg.user_agent)))
        return graph.withColumn(
            "status", F.when(mismatch, F.lit(500)).otherwise(F.col("status"))
        ).withColumn(
            "content_type",
            F.when(mismatch, F.lit("text/html")).otherwise(F.col("content_type")),
        ).withColumn(
            "body", F.when(mismatch, F.lit("")).otherwise(F.col("body")))

    def _resolve_closure(self, graph: DataFrame, cfg: CrawlConfig) -> DataFrame:
        """Follow 3xx chains within the graph once, up to
        max_redirect_hops; a dangling redirect target resolves to 404
        (exactly what requests would get from the fixture server)."""
        g = self._ua_gated(graph, cfg)
        if not cfg.follow_redirects:
            return g
        served = g.select(
            F.col("url_norm").alias("g_key"),
            F.col("status").alias("g_status"),
            F.col("content_type").alias("g_content_type"),
            F.col("body").alias("g_body"),
            F.col("redirect_location").alias("g_redirect_location"),
            F.col("image_id").alias("g_image_id"),
        )
        cur = g.select(
            "url", "url_norm", "status", "content_type", "body",
            "redirect_location", "ua_required", "image_id",
            F.col("url_norm").alias("cursor"),
        )
        is_redir = (
            (status_class_expr(F.col("status")) == 3)
            & F.col("redirect_location").isNotNull()
        )
        out = cur.filter(~is_redir)
        pending = cur.filter(is_redir)
        for _ in range(self.cfg.max_redirect_hops):
            if pending.isEmpty():
                break
            # resolve Location against the current cursor url, re-join
            hopped = pending.select(
                "url", "url_norm", "ua_required",
                canonicalize(
                    resolve(F.col("cursor"), F.col("redirect_location"))
                ).getField("url_norm").alias("cursor"),
            )
            hop = hopped.join(
                served, hopped.cursor == F.col("g_key"), "left"
            ).select(
                "url", "url_norm",
                F.coalesce("g_status", F.lit(404)).alias("status"),
                F.col("g_content_type").alias("content_type"),
                F.col("g_body").alias("body"),
                F.col("g_redirect_location").alias("redirect_location"),
                "ua_required",
                F.col("g_image_id").alias("image_id"),
                "cursor",
            )
            hop = hop.localCheckpoint(eager=True)  # keep the loop's lineage flat
            is_redir = (
                (status_class_expr(F.col("status")) == 3)
                & F.col("redirect_location").isNotNull()
            )
            out = out.unionByName(hop.filter(~is_redir))
            pending = hop.filter(is_redir)
        return out.unionByName(pending)  # hop budget exhausted → as-is

    def __call__(self, frontier: DataFrame,
                 mime_types: tuple[str, ...] | None = None) -> DataFrame:
        # mime_types is accepted for interface parity with HttpFetcher;
        # the table fetcher applies no fetch-time gate (G1/G2 run
        # downstream on the returned status/content_type, and the
        # check_head saving is column pruning — module docstring)
        g = F.broadcast(self._served) if self._broadcast else self._served
        fetched = frontier.join(
            g, frontier.url_norm == F.col("g_url_norm"), "left")
        return fetched.select(
            "url_norm", "url_raw", "host", "authority", "depth", "priority",
            "round",
            F.coalesce("status", F.lit(404)).alias("status"),
            "content_type", "body", "redirect_location", "image_id",
        )


class HttpFetcher:
    """Real-network fetch for parity tests: requests.Session per
    partition inside mapInPandas (Arrow-batched; cite requester.py:45-79
    for the gate semantics, applied downstream identically)."""

    def __init__(self, cfg: CrawlConfig):
        self.cfg = cfg

    def __call__(self, frontier: DataFrame,
                 mime_types: tuple[str, ...] | None = None) -> DataFrame:
        """``mime_types`` overrides cfg.mime_types for THIS call — the
        reference requester takes a per-call mime gate
        (requester.py:45-50) and the crawler fetches robots.txt with
        ('text/plain',) (crawler.py:186-189). Without the override a
        check_head fetcher would HEAD-gate robots.txt against the page
        mime types (text/html), silently dropping every robots rule."""
        from pyspark.sql import types as T

        cfg = self.cfg
        gate_mimes = tuple(m.lower() for m in (mime_types or cfg.mime_types))
        out_schema = T.StructType([
            T.StructField("url_norm", T.StringType()),
            T.StructField("url_raw", T.StringType()),
            T.StructField("host", T.StringType()),
            T.StructField("authority", T.StringType()),
            T.StructField("depth", T.IntegerType()),
            T.StructField("priority", T.DoubleType()),
            T.StructField("round", T.IntegerType()),
            T.StructField("status", T.IntegerType()),
            T.StructField("content_type", T.StringType()),
            T.StructField("body", T.StringType()),
            T.StructField("redirect_location", T.StringType()),
            T.StructField("image_id", T.StringType()),
        ])

        def fetch_batches(iterator):
            import threading
            from concurrent.futures import ThreadPoolExecutor

            import pandas as pd
            import requests

            # requests.Session is not thread-safe (cookie jar /
            # redirect state can race) — one Session per worker
            # thread, created lazily and reused across batches
            tls = threading.local()

            def get_session():
                session = getattr(tls, "session", None)
                if session is None:
                    session = requests.Session()
                    if cfg.user_agent:
                        session.headers["User-Agent"] = cfg.user_agent
                    tls.session = session
                return session

            mimes = gate_mimes

            def fetch_one(row):
                session = get_session()
                try:
                    if cfg.check_head:
                        # S3/G3 (requester.py:102-105): probe the
                        # Content-Type with HEAD; skip the body GET
                        # for error or wrong-MIME responses — the
                        # downstream gates see the same
                        # status/content_type either way
                        head = session.request(
                            "HEAD", row.url_norm, timeout=(2, 15),
                            allow_redirects=cfg.follow_redirects)
                        hct = (head.headers.get("Content-Type")
                               or "").lower()
                        hs = int(head.status_code)
                        if (hs // 100 != 2
                                or not any(m in hct for m in mimes)):
                            return (hs, head.headers.get("Content-Type"),
                                    None, head.headers.get("Location"))
                    resp = session.request(
                        "GET", row.url_norm, timeout=(2, 15),
                        allow_redirects=cfg.follow_redirects)
                    return (int(resp.status_code),
                            resp.headers.get("Content-Type"),
                            resp.text, resp.headers.get("Location"))
                except Exception:
                    return (404, None, None, None)  # unreachable == 4xx

            # the reference's max_workers thread pool (crawler.py:102-110)
            # applied WITHIN the Arrow batch: IO-bound fetches overlap,
            # row order is preserved by executor.map, and each Spark
            # partition multiplies the concurrency across the cluster
            workers = max(1, int(getattr(cfg, "fetch_concurrency", 1)))
            for pdf in iterator:
                rows = list(pdf.itertuples(index=False))
                if workers > 1 and len(rows) > 1:
                    with ThreadPoolExecutor(max_workers=workers) as ex:
                        fetched = list(ex.map(fetch_one, rows))
                else:
                    fetched = [fetch_one(row) for row in rows]
                recs = [{
                    "url_norm": row.url_norm, "url_raw": row.url_raw,
                    "host": row.host, "authority": row.authority,
                    "depth": row.depth, "priority": row.priority,
                    "round": row.round, "status": status,
                    "content_type": ctype, "body": body,
                    "redirect_location": loc, "image_id": None,
                } for row, (status, ctype, body, loc) in zip(rows, fetched)]
                yield pd.DataFrame(recs, columns=out_schema.fieldNames())

        cols = ["url_norm", "url_raw", "host", "authority", "depth",
                "priority", "round"]
        return frontier.select(*cols).mapInPandas(fetch_batches, out_schema)
