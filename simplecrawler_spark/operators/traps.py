"""Crawl-trap detection: flag URLs a frontier should not burn fetch
budget on.

The reference crawls fixture-sized sites and needs no trap defence
(crawler.py drains a finite queue); an open-web frontier meets
infinite URL spaces — calendar pagers, session-id echoes, symlink
loops (/a/b/a/b/...), parameter exploders — that no politeness or
seen-filter stops, because every URL is NEW. Trap heuristics are the
standard third leg (alongside robots + dedup) of frontier hygiene.

Everything here is pure per-row JVM expression machinery (regexp +
array HOFs — codegen, no Python, no shuffle): the flags bolt onto the
discovery stage of the crawl round at zero extra passes, and the
q_url_traps oracle twins every rule in DuckDB SQL exactly.

Rules (each its own flag; ``is_trap`` is their OR):

  * ``trap_deep``      — more than ``max_depth`` path segments.
  * ``trap_repeat``    — some path segment occurs ≥ ``repeat_k``
    times (the /a/b/a/b/a symlink-loop signature). Exact max
    multiplicity via a nested-lambda count — O(n²) over the ≤~50
    segments of one URL, constant work per row.
  * ``trap_params``    — more than ``max_params`` query parameters.
  * ``trap_session``   — a session/state token parameter name
    (phpsessid, jsessionid, sid, ...): every visitor mints a fresh
    URL, so the seen-filter never converges.
  * ``trap_calendar``  — ≥2 date-shaped path segments (YYYY or
    YYYY-MM or YYYY-MM-DD): the infinite-calendar pager signature.
  * ``trap_long``      — URL longer than ``max_len`` chars.

Scale shape: narrow projections of one string column; Catalyst keeps
them in WholeStageCodegen beside the canonicaliser's other gates.
Flags are cheap enough to compute at discovery grain (every extracted
href) BEFORE the dedupe shuffle, so trapped URLs never enter the
frontier at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["url_trap_flags", "url_quality_features",
           "host_suffixes_expr", "blocklist_gate",
           "SESSION_PARAM_RE", "DATE_SEG_RE"]

# parameter NAMES that mint per-visitor URL spaces. Anchored at a
# param boundary; matched against the lowercased query string.
SESSION_PARAM_RE = (r"(^|&)(phpsessid|jsessionid|sessionid|session_id"
                    r"|sess|sid|cfid|cftoken|zenid|aspsessionid[a-z]*)=")

# date-shaped path segment: YYYY / YYYY-MM / YYYY-MM-DD
DATE_SEG_RE = r"^(19|20)[0-9]{2}(-[0-9]{2}(-[0-9]{2})?)?$"

# scheme://authority then capture the path (stops at ? or #)
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def url_trap_flags(url: Column, *, max_depth: int = 12,
                   max_params: int = 10, max_len: int = 2048,
                   repeat_k: int = 3) -> dict[str, Column]:
    """Trap flags for one URL string column, as named pure-JVM
    expressions (attach with ``df.withColumns(url_trap_flags(col))``).

    Returns {"depth", "n_params", "trap_deep", "trap_repeat",
    "trap_params", "trap_session", "trap_calendar", "trap_long",
    "is_trap"} — see the module docstring for each rule.
    """
    path = F.regexp_extract(url, _PATH_RE, 1)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    segs = F.filter(F.split(path, "/"), lambda x: x != F.lit(""))
    depth = F.size(segs).cast("long")
    n_params = (F.when(query == "", F.lit(0))
                .otherwise(F.size(F.split(query, "&")))).cast("long")
    trap_deep = depth > max_depth
    # exact max segment multiplicity: does ANY segment recur >= k?
    trap_repeat = F.exists(
        segs, lambda s: F.size(F.filter(segs, lambda x: x == s))
        >= F.lit(repeat_k))
    trap_params = n_params > max_params
    trap_session = F.lower(query).rlike(SESSION_PARAM_RE)
    trap_calendar = (
        F.size(F.filter(segs, lambda s: s.rlike(DATE_SEG_RE))) >= 2)
    trap_long = F.length(url) > max_len
    is_trap = (trap_deep | trap_repeat | trap_params | trap_session
               | trap_calendar | trap_long)
    return {
        "depth": depth,
        "n_params": n_params,
        "trap_deep": trap_deep,
        "trap_repeat": trap_repeat,
        "trap_params": trap_params,
        "trap_session": trap_session,
        "trap_calendar": trap_calendar,
        "trap_long": trap_long,
        "is_trap": is_trap,
    }


# scheme://[userinfo@]host — host stops at port/path/query/fragment
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)"


def url_quality_features(url: Column) -> dict[str, Column]:
    """URL-shape quality features as named pure-JVM expressions — the
    signals URL-level corpus classifiers use (FineWeb filters on URL
    shape before fetching; hashed_linear_score consumes these the way
    its token buckets consume text): host and top-level domain,
    subdomain count, URL/path lengths, path depth, query-parameter
    and digit counts. ALL exact integers or lowercase strings (no
    ratios — consumers derive them with integer DIV so nothing float
    crosses engines). One narrow projection over the url column, no
    shuffle, no Python; attach with ``df.withColumns(...)`` or select
    individual entries."""
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    path = F.regexp_extract(url, _PATH_RE, 1)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    labels = F.filter(F.split(host, r"\."), lambda x: x != F.lit(""))
    segs = F.filter(F.split(path, "/"), lambda x: x != F.lit(""))
    return {
        "host": F.nullif(host, F.lit("")),
        # try_element_at: a malformed URL yields an empty label array,
        # and ANSI-mode element_at(-1) would fail the whole stage
        "tld": F.nullif(F.try_element_at(labels, F.lit(-1)),
                        F.lit("")),
        "n_subdomains": F.greatest(F.size(labels) - 2, F.lit(0))
        .cast("long"),
        "url_len": F.length(url).cast("long"),
        "path_len": F.length(path).cast("long"),
        "path_depth": F.size(segs).cast("long"),
        "n_params": (F.when(query == "", F.lit(0))
                     .otherwise(F.size(F.split(query, "&"))))
        .cast("long"),
        "n_digits": (F.length(url)
                     - F.length(F.regexp_replace(url, "[0-9]", "")))
        .cast("long"),
    }


def host_suffixes_expr(url: Column) -> Column:
    """All DNS suffixes of the URL's host with >= 2 labels, plus the
    host itself — ``a.b.example.com`` → [a.b.example.com,
    b.example.com, example.com]. The bare TLD is excluded (blocking
    'com' outright is never what a blocklist means). Single-label
    hosts (localhost) yield themselves; a URL with no parseable host
    yields an empty array. Pure JVM split/slice HOFs — a host has
    ~2–6 labels, so this is constant work per row."""
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    host = F.regexp_replace(host, r"^\.+|\.+$", "")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return (F.when(host == "", F.array().cast("array<string>"))
            .when(n == 1, F.array(host))
            .otherwise(F.transform(
                F.sequence(F.lit(0), n - 2),
                lambda i: F.array_join(F.slice(labels, i + 1, n - i),
                                       "."))))


def blocklist_gate(urls: DataFrame, blocklist: DataFrame,
                   url_col: str = "url", domain_col: str = "domain",
                   broadcast_list: bool = True) -> DataFrame:
    """C4-style domain blocklist gate: drop every URL whose host IS a
    blocked domain or is a SUBDOMAIN of one (C4 filtered Common Crawl
    against the public 'bad-words domain' lists this way; any curated
    corpus needs the same gate for licence/abuse/tracker domains).

    Returns the input columns plus ``blocked_domain`` (the LONGEST —
    most specific — matching blocklist entry, NULL when clean) and
    ``keep``.

    Scale shape: suffix-EXPLODE + equi-JOIN, never a LIKE/regex join —
    each URL yields ≤ ~6 candidate suffix keys, hash-joined against
    the blocklist (broadcast when ``broadcast_list``, the common case
    of a ≤10^6-entry curated list; plain shuffle hash join otherwise —
    both O(rows), no cartesian). The most-specific-match reduce is a
    combinable max(struct(len, domain)) on the url key, and only URLs
    that HIT the list reach it — at open-web scale that is a small
    fraction of the frontier, so the join back to the input is a
    skinny-side join.
    """
    bl = (blocklist.select(F.lower(F.col(domain_col))
                           .alias("_bl_domain")).distinct())
    if broadcast_list:
        bl = F.broadcast(bl)
    cands = urls.select(
        F.col(url_col),
        F.explode(host_suffixes_expr(F.col(url_col))).alias("_cand"))
    hits = (cands.join(bl, cands["_cand"] == bl["_bl_domain"])
            .groupBy(url_col)
            .agg(F.max(F.struct(F.length("_cand").alias("l"),
                                F.col("_cand").alias("d")))
                 .getField("d").alias("blocked_domain")))
    return (urls.join(hits, url_col, "left")
            .select(*urls.columns, "blocked_domain",
                    F.col("blocked_domain").isNull().alias("keep")))
