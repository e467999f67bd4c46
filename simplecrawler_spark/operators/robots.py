"""robots.txt — S4 source + G4 can_fetch gate + crawl_delay extraction.

Reference semantics (crawler.py:182-194, 224-239):
  * robots.txt fetched from `{domain}/robots.txt` with a `text/plain`
    MIME gate; ANY error (4xx/5xx/wrong-mime) → empty rules (allow all).
  * fetched unconditionally, even when obey_robots=False
    (crawler.py:201-203) — the engine mirrors that: the robots table is
    always built, the gate is applied only when obey_robots.
  * can_fetch evaluated by stdlib urllib.robotparser — the engine uses
    the SAME parser for exact parity, host-cached inside an Arrow
    batch (host count ≪ URL count; the text is broadcast, the per-URL
    work is a dict lookup + prefix match).
  * crawl_delay feeds the politeness budget (G5) — extracted once per
    (host, user_agent) driver-side.

The reference is single-site (one robots fetch per crawl); the engine
generalises to one robots row per authority, built by fetching
`scheme://authority/robots.txt` through the same fetcher used for
pages.
"""

from __future__ import annotations

import inspect
from urllib.robotparser import RobotFileParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from simplecrawler_spark.config import CrawlConfig
from simplecrawler_spark.functions.canonical import canon_parts
from simplecrawler_spark.sources.fetch import mime_ok_expr, status_class_expr


def robots_urls_for(frontier: DataFrame) -> DataFrame:
    """Distinct `scheme://authority/robots.txt` fetch rows for every
    authority present in the frontier (reference Hyperlink.with_path,
    hyperlink.py:83-85)."""
    doms = (
        frontier.select("authority", F.split("url_norm", "://")
                        .getItem(0).alias("scheme"))
        .where(F.col("authority") != "")
        .distinct()
    )
    url = F.concat(F.col("scheme"), F.lit("://"), F.col("authority"),
                   F.lit("/robots.txt"))
    return doms.select(
        url.alias("url_norm"), url.alias("url_raw"),
        F.col("authority").alias("host"), "authority",
        F.lit(0).alias("depth"), F.lit(0.0).alias("priority"),
        F.lit(-1).alias("round"),
    )


def _fetch_robots_rows(fetcher, df: DataFrame) -> DataFrame:
    """Fetch robots.txt rows with a per-call text/plain mime gate when
    the fetcher supports one (reference crawler.py:186-189:
    ``self._requester(robots_url, mime_types=("text/plain",))``).
    A check_head HttpFetcher would otherwise HEAD-probe robots.txt
    against the page mime types (text/html) and return body=None for
    every robots file — silently disabling all disallow/crawl-delay
    rules."""
    try:
        params = inspect.signature(fetcher).parameters
    except (TypeError, ValueError):  # builtins / odd callables
        params = {}
    if "mime_types" in params:
        return fetcher(df, mime_types=("text/plain",))
    return fetcher(df)


def _gate_robots_fetch(fetched: DataFrame) -> pd.DataFrame:
    ok = (status_class_expr(F.col("status")) == 2) & mime_ok_expr(
        F.col("content_type"), ("text/plain",))
    return (
        fetched.select(
            "authority",
            F.when(ok, F.col("body")).otherwise(F.lit("")).alias("robots_txt"))
        .toPandas()
    )


def fetch_robots_for(spark, auth_scheme: dict[str, str], fetcher,
                     cfg: CrawlConfig) -> pd.DataFrame:
    """Like build_robots_table but from a driver-side
    {authority: scheme} dict — no frontier scan at all. The round loop
    tracks authorities driver-side, so robots discovery costs zero
    Spark jobs on the frontier."""
    rows = [
        (f"{scheme}://{auth}/robots.txt", f"{scheme}://{auth}/robots.txt",
         auth, auth, 0, 0.0, -1)
        for auth, scheme in sorted(auth_scheme.items()) if auth
    ]
    if not rows:
        return pd.DataFrame(columns=["authority", "robots_txt", "crawl_delay"])
    df = spark.createDataFrame(
        rows, "url_norm string, url_raw string, host string, "
              "authority string, depth int, priority double, round int")
    return _with_delays(_gate_robots_fetch(_fetch_robots_rows(fetcher, df)),
                        cfg)


def build_robots_table(frontier: DataFrame, fetcher,
                       cfg: CrawlConfig) -> pd.DataFrame:
    """Fetch+gate robots.txt per authority → small driver-side pandas
    table (authority, robots_txt, crawl_delay). Empty rules on any
    error (crawler.py:191-192)."""
    rows = _gate_robots_fetch(
        _fetch_robots_rows(fetcher, robots_urls_for(frontier)))
    return _with_delays(rows, cfg)


def _with_delays(rows: pd.DataFrame, cfg: CrawlConfig) -> pd.DataFrame:
    delays = []
    for txt in rows["robots_txt"]:
        rp = RobotFileParser()
        rp.parse((txt or "").splitlines())
        try:
            delay = rp.crawl_delay(cfg.user_agent)
        except AttributeError:  # py3.6 bug parity (crawler.py:231-238)
            delay = None
        delays.append(float(delay) if delay else None)
    rows["crawl_delay"] = delays
    return rows


# above this many authorities, the rule table stops riding in a UDF
# closure (it would be re-pickled into every task and live whole on
# every executor) and becomes a relational join side instead
CLOSURE_MAX_AUTHORITIES = 10_000


def can_fetch_filter(frontier: DataFrame, robots_rows: pd.DataFrame,
                     cfg: CrawlConfig) -> DataFrame:
    """G4: keep frontier rows the robots rules allow for cfg.user_agent.

    Evaluation is the stdlib RobotFileParser itself (exact reference
    parity), one parser per distinct authority cached across the Arrow
    batch; rule text rides in the UDF closure (broadcast-sized: one
    row per authority). Past CLOSURE_MAX_AUTHORITIES the closure stops
    scaling and evaluation switches to can_fetch_join — same semantics,
    rules as a join side."""
    if not cfg.obey_robots or robots_rows.empty:
        return frontier
    if not any((txt or "") for txt in robots_rows["robots_txt"]):
        # every authority has empty rules — RobotFileParser allows all
        # (crawler.py:191-192 error→empty parity); skip the UDF stage
        return frontier
    if len(robots_rows) > CLOSURE_MAX_AUTHORITIES:
        robots_df = frontier.sparkSession.createDataFrame(
            robots_rows[["authority", "robots_txt"]])
        return can_fetch_join(frontier, robots_df, cfg)
    txt_by_auth = dict(zip(robots_rows["authority"], robots_rows["robots_txt"]))
    agent = cfg.user_agent

    @F.pandas_udf(T.BooleanType())
    def allowed(authority: pd.Series, url_norm: pd.Series) -> pd.Series:
        cache: dict[str, RobotFileParser] = {}
        out = []
        for auth, url in zip(authority, url_norm):
            txt = txt_by_auth.get(auth, "")
            rp = cache.get(auth)
            if rp is None:
                rp = RobotFileParser()
                rp.parse((txt or "").splitlines())
                cache[auth] = rp
            out.append(bool(rp.can_fetch(agent, url)))
        return pd.Series(out)

    return frontier.filter(allowed(F.col("authority"), F.col("url_norm")))


def can_fetch_join(frontier: DataFrame, robots_df: DataFrame,
                   cfg: CrawlConfig) -> DataFrame:
    """G4 at authority scale: rules live in a TABLE
    (authority, robots_txt), the frontier left-joins it on authority
    (AQE broadcasts while the table is small, co-shuffles on authority
    once it isn't — at web scale both sides are already partitionable
    by authority/host), and the same stdlib parser evaluates each row.
    A frontier row with no rules — unknown authority or empty text —
    is allowed, exactly like the closure path and the reference's
    error→empty behaviour (crawler.py:191-192)."""
    if not cfg.obey_robots:
        return frontier
    agent = cfg.user_agent

    @F.pandas_udf(T.BooleanType())
    def allowed(robots_txt: pd.Series, authority: pd.Series,
                url_norm: pd.Series) -> pd.Series:
        cache: dict[str, RobotFileParser] = {}
        out = []
        for txt, auth, url in zip(robots_txt, authority, url_norm):
            if not txt:  # no rules → allow
                out.append(True)
                continue
            rp = cache.get(auth)
            if rp is None:
                rp = RobotFileParser()
                rp.parse(txt.splitlines())
                cache[auth] = rp
            out.append(bool(rp.can_fetch(agent, url)))
        return pd.Series(out)

    joined = frontier.join(
        robots_df.select("authority", "robots_txt"), "authority", "left")
    return (joined.filter(allowed(F.col("robots_txt"), F.col("authority"),
                                  F.col("url_norm")))
            .drop("robots_txt"))


def crawl_delay_map(robots_rows: pd.DataFrame) -> dict[str, float]:
    """authority → crawl_delay seconds (None rows dropped)."""
    if robots_rows.empty:
        return {}
    out = {}
    for auth, delay in zip(robots_rows["authority"], robots_rows["crawl_delay"]):
        if delay is not None and not pd.isna(delay):
            out[auth] = float(delay)
    return out


def parse_robots_text(txt: str, user_agent: str) -> RobotFileParser:
    """Driver-side helper mirroring reference _get_robots result."""
    rp = RobotFileParser()
    rp.parse((txt or "").splitlines())
    return rp


__all__ = [
    "robots_urls_for", "build_robots_table", "can_fetch_filter",
    "can_fetch_join", "crawl_delay_map", "parse_robots_text",
    "canon_parts",
]
