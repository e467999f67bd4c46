"""Link extraction — operators P1/P2/P3 (SURVEY.md §2.4).

Reference: AnchorTagParser / get_hrefs_from_html
(/root/reference/simple_crawler/parser.py:11-56): stdlib
html.parser.HTMLParser, `<a>` tags only, every `href` attribute,
parse errors ignored, page-level dedupe by *normalised* URL equality
(the parser collects a set of Hyperlinks).

Engine shape: one Arrow-batched pandas UDF `extract_hrefs` returning
`array<string>` of RAW hrefs (first raw occurrence per normalised
form, document order — deterministic where the reference's set
iteration order is not), then `F.explode` to one link-row per href.
The parse itself is per-document Python either way; Arrow batching
removes per-row serialisation (north-rule vectorisation constraint,
BASELINE.json:15).
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from simplecrawler_spark.functions.canonical import (
    canon_parts, resolve_raw, trim_raw,
)


class _HrefCollector(HTMLParser):
    """Collect raw href values of <a> tags in document order."""

    def __init__(self):
        super().__init__()
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for name, value in attrs:
                if name == "href" and value is not None:
                    self.hrefs.append(value)

    def error(self, message):  # pragma: no cover — parity: ignore bad HTML
        pass


# --- opt-in fast link extractor --------------------------------------------
# The stdlib HTMLParser is the reference-parity default (parser.py:11-56)
# but costs ~87 µs/page on the 8-link synthetic body — ~83% of the whole
# fused parse stage (measured round 3). The regex scan below is ~9x
# faster and byte-identical on well-formed HTML: same tags (<a>, any
# case), every href attribute per tag (duplicates kept, document
# order), quoted or unquoted values, entity-unescaped like HTMLParser
# unescapes attribute values. DOCUMENTED DIVERGENCE: it also matches
# <a> markup inside comments and <script>/CDATA text, which a real
# parser skips — hence opt-in (CrawlConfig.link_extractor="regex"),
# never the default. Equivalence + divergence pinned by
# tests/test_parse.py::test_fast_extractor_*.

_A_TAG_RE = re.compile(r"<a(\s[^>]*)?>", re.I | re.S)
_HREF_RE = re.compile(
    r"""href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.I)


def hrefs_fast(html: str) -> list[str]:
    """Regex href scan — see the divergence note above."""
    out: list[str] = []
    for m in _A_TAG_RE.finditer(html):
        attrs = m.group(1)
        if not attrs:
            continue
        for hm in _HREF_RE.finditer(attrs):
            v = hm.group(1)
            if v is None:
                v = hm.group(2)
            if v is None:
                v = hm.group(3)
            out.append(unescape(v))
    return out


def _hrefs_stdlib(html: str) -> list[str]:
    collector = _HrefCollector()
    try:
        collector.feed(html)
    except Exception:
        pass  # parity: bad HTML ignored (parser.py:39-42)
    return collector.hrefs


class _FollowHrefCollector(HTMLParser):
    """Like _HrefCollector but drops <a> tags carrying
    rel=nofollow (rel is a space-separated token list per the HTML
    spec; ugc/sponsored are left followable — only the explicit
    nofollow token opts a link out of crawling)."""

    def __init__(self):
        super().__init__()
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            hrefs, nofollow = [], False
            for name, value in attrs:
                if name == "href" and value is not None:
                    hrefs.append(value)
                elif name == "rel" and value:
                    nofollow |= "nofollow" in value.lower().split()
            if not nofollow:
                self.hrefs.extend(hrefs)

    def error(self, message):  # pragma: no cover — parity
        pass


def _hrefs_stdlib_nofollow(html: str) -> list[str]:
    collector = _FollowHrefCollector()
    try:
        collector.feed(html)
    except Exception:
        pass  # parity: bad HTML ignored (parser.py:39-42)
    return collector.hrefs


_EXTRACTORS = {"stdlib": _hrefs_stdlib, "regex": hrefs_fast,
               "nofollow": _hrefs_stdlib_nofollow}


def hrefs_from_html(html: str) -> list[str]:
    """Pure-Python core: raw hrefs, deduped by canonical form
    (first raw spelling wins), document order."""
    out: list[str] = []
    seen_norm: set[str] = set()
    for raw in _hrefs_stdlib(html):
        norm = canon_parts(raw)[0]
        if norm not in seen_norm:
            seen_norm.add(norm)
            out.append(raw)
    return out


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_hrefs(bodies: pd.Series) -> pd.Series:
    return pd.Series([
        None if body is None else hrefs_from_html(body) for body in bodies
    ])


def _page_links(src_raw, src_norm, status, loc, body, *,
                record_redirects: bool, trim_query: bool,
                trim_fragment: bool, with_found: bool,
                hrefs_fn=_hrefs_stdlib):
    """THE per-page link contract, shared by extract_links_canonical
    (link grain) and attach_links_canonical (page grain) so the staged
    crawl path and the standalone operator can never drift:
    redirect-as-link / HTML parse → page-level dedupe → trim →
    resolve → canonicalise. Returns [(raw, href_norm|None,
    url_resolved|None, parts)] in document order.

    Page-level dedupe happens on the FINAL canonical form (one
    canon_parts per href instead of two — the reference's pre-trim
    set-dedupe and this collapse to the same visited set because the
    cross-page groupBy dedupes on url_norm anyway; first spelling
    wins, deterministic). ``with_found`` (S5 log mode) switches the
    dedupe key to the pre-trim normalised href — the exact grain the
    reference's HyperlinkSet keeps (parser.py:45-56) and the string
    it prints as "FOUND: {href} ON {url}" (crawler.py:155)."""
    if (record_redirects and status is not None
            and 300 <= int(status) < 400 and loc is not None):
        hrefs = [loc]
    elif body is None:
        hrefs = []
    else:
        hrefs = hrefs_fn(body)
    base = src_raw if src_raw is not None else src_norm
    page_seen: set[str] = set()
    out = []
    for raw in hrefs:
        href_norm = None
        if with_found:
            href_norm = canon_parts(raw)[0]
            if href_norm in page_seen:
                continue
            page_seen.add(href_norm)
        # string-level trim — same semantics as the JVM
        # trim_query_fragment_expr fast path (the crawl's only trim
        # use, crawler.py:136)
        if trim_query or trim_fragment:
            head, _, frag = raw.partition("#")
            if trim_query:
                head = head.partition("?")[0]
            trimmed = (head if trim_fragment or not frag
                       else f"{head}#{frag}")
        else:
            trimmed = raw
        # urljoin returns already-lowercase-absolute hrefs verbatim —
        # skip it for the common case
        if trimmed.startswith(("http://", "https://")):
            resolved = trimmed
        else:
            resolved = resolve_raw(base, trimmed)
        parts = canon_parts(resolved)
        if not with_found:
            if parts[0] in page_seen:
                continue
            page_seen.add(parts[0])
        # url_resolved rides as NULL when it equals the canonical form
        # (the overwhelming majority): downstream resolution bases
        # coalesce to url_norm, and the dedupe/anti-join shuffles
        # carry one wide string instead of two
        rv = None if resolved == parts[0] else resolved
        out.append((raw, href_norm, rv, parts))
    return out


LINKS_CANON = T.StructType([
    T.StructField("src_url", T.StringType()),
    T.StructField("src_authority", T.StringType()),
    T.StructField("depth", T.IntegerType()),
    T.StructField("href_raw", T.StringType()),
    T.StructField("url_resolved", T.StringType()),
    T.StructField("url_norm", T.StringType()),
    T.StructField("scheme", T.StringType()),
    T.StructField("authority", T.StringType()),
    T.StructField("host", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("query", T.StringType()),
    T.StructField("fragment", T.StringType()),
])

# What the crawl loop actually consumes — mapInPandas cannot be
# column-pruned by Catalyst, so the narrow schema is opt-in here
LINKS_CANON_MIN = T.StructType([
    T.StructField("src_url", T.StringType()),
    T.StructField("src_authority", T.StringType()),
    T.StructField("depth", T.IntegerType()),
    T.StructField("url_resolved", T.StringType()),
    T.StructField("url_norm", T.StringType()),
    T.StructField("authority", T.StringType()),
    T.StructField("host", T.StringType()),
])

# with_found=True appends the PRE-trim/resolve normalised href — the
# exact string the reference prints as "FOUND: {href} ON {url}"
# (crawler.py:155: str(Hyperlink(raw_href)))
HREF_NORM_FIELD = T.StructField("href_norm", T.StringType())


def extract_links_canonical(fetched: DataFrame, *, trim_query: bool = True,
                            trim_fragment: bool = True,
                            record_redirects: bool = False,
                            minimal: bool = False,
                            with_found: bool = False,
                            extractor: str = "stdlib") -> DataFrame:
    """Fused P1/P2/P3 → F12 trim → F16 resolve → F8 canonicalize in ONE
    mapInPandas stage.

    The chain parse → trim → resolve → canonicalise is per-row Python
    either way (stdlib HTMLParser / urljoin / quote for exact reference
    parity — SURVEY.md §7.3); running it as separate pandas UDFs costs
    one Arrow serialisation round-trip and one Python-worker stage
    each. Fusing them turns four Python stages per crawl round into
    one, with the explode happening inside the batch. Semantics are
    identical to explode_links + trim_raw + resolve_raw + canon_parts
    (pinned by tests/test_crawl.py and the reference-parity suites).

    ``with_found=True`` (S5 crawl-log mode) appends an ``href_norm``
    column — the normalised raw href BEFORE trim/resolve, exactly what
    the reference prints as "FOUND: {href} ON {url}" — and switches the
    page-level dedupe key to that pre-trim form (the reference's
    HyperlinkSet dedupes there, parser.py:45-56). The cross-page
    groupBy on the final url_norm makes the visited set identical
    either way; log mode just keeps the finer grain the transcript
    needs.
    """
    hrefs_fn = _EXTRACTORS[extractor]
    cols = ["url_norm", "url_raw", "authority", "depth", "status",
            "redirect_location", "body"]
    schema = LINKS_CANON_MIN if minimal else LINKS_CANON
    if with_found:
        schema = T.StructType(schema.fields + [HREF_NORM_FIELD])

    def gen(batches):
        for pdf in batches:
            rows = []
            for (src_norm, src_raw, src_auth, depth, status, loc,
                 body) in zip(pdf["url_norm"], pdf["url_raw"],
                              pdf["authority"], pdf["depth"],
                              pdf["status"], pdf["redirect_location"],
                              pdf["body"]):
                d = None if depth is None else int(depth)
                for raw, href_norm, rv, parts in _page_links(
                        src_raw, src_norm, status, loc, body,
                        record_redirects=record_redirects,
                        trim_query=trim_query,
                        trim_fragment=trim_fragment,
                        with_found=with_found, hrefs_fn=hrefs_fn):
                    if minimal:
                        row = (src_norm, src_auth, d, rv, parts[0],
                               parts[2], parts[3])
                    else:
                        row = (src_norm, src_auth, d, raw, rv, *parts)
                    rows.append((row + (href_norm,)) if with_found else row)
            yield pd.DataFrame(rows, columns=schema.fieldNames())

    return fetched.select(*cols).mapInPandas(gen, schema)


def _page_links_schema(with_found: bool) -> T.StructType:
    link_fields = [
        T.StructField("url_resolved", T.StringType()),
        T.StructField("url_norm", T.StringType()),
        T.StructField("authority", T.StringType()),
        T.StructField("host", T.StringType()),
    ]
    if with_found:
        link_fields.append(T.StructField("href_norm", T.StringType()))
    return T.StructType([
        T.StructField("url_norm", T.StringType()),
        T.StructField("authority", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("redirect_location", T.StringType()),
        T.StructField("image_id", T.StringType()),
        T.StructField("links", T.ArrayType(T.StructType(link_fields))),
    ])


def attach_links_canonical(fetched: DataFrame, *, trim_query: bool = True,
                           trim_fragment: bool = True,
                           record_redirects: bool = False,
                           with_found: bool = False,
                           parse_flag_col: str = "_parse",
                           extractor: str = "stdlib") -> DataFrame:
    """PAGE-grain fused parse: every fetched row comes back as one row
    of fetch metadata plus a ``links array<struct>`` column holding the
    page's trimmed/resolved/canonicalised out-links (same per-link
    semantics as extract_links_canonical — shared inner loop contract,
    pinned by the crawl suites).

    This is the shape the crawl's per-round STAGING file wants: the
    round's single full materialisation keeps page grain, so the
    results/transcript/seed consumers scan pruned metadata columns,
    the link consumers explode the ``links`` column, and the page BODY
    — the only column whose sole consumer is this parse — never
    round-trips through the staged parquet at all: it streams from the
    fetcher straight into this stage's Arrow batches and is dropped on
    output. (Round-3 A/B: staging bodies cost ~40% of crawl wall at
    1M pages / local[8].)

    ``parse_flag_col`` is a JVM-computed boolean (done ∧ parseable —
    the owner derives it from cfg's status/MIME gates): rows where it
    is false come back with ``links = []`` without the body ever
    entering the Python HTML parser.
    """
    hrefs_fn = _EXTRACTORS[extractor]
    cols = ["url_norm", "url_raw", "authority", "depth", "status",
            "content_type", "redirect_location", "image_id", "body",
            parse_flag_col]
    schema = _page_links_schema(with_found)

    def gen(batches):
        for pdf in batches:
            out_links: list[list[dict]] = []
            for (src_raw, src_norm, status, loc, body, do_parse) in zip(
                    pdf["url_raw"], pdf["url_norm"], pdf["status"],
                    pdf["redirect_location"], pdf["body"],
                    pdf[parse_flag_col]):
                if not do_parse:
                    out_links.append([])
                    continue
                links: list[dict] = []
                for _raw, href_norm, rv, parts in _page_links(
                        src_raw, src_norm, status, loc, body,
                        record_redirects=record_redirects,
                        trim_query=trim_query,
                        trim_fragment=trim_fragment,
                        with_found=with_found, hrefs_fn=hrefs_fn):
                    link = {
                        "url_resolved": rv,
                        "url_norm": parts[0],
                        "authority": parts[2],
                        "host": parts[3],
                    }
                    if with_found:
                        link["href_norm"] = href_norm
                    links.append(link)
                out_links.append(links)
            out = pdf[["url_norm", "authority", "depth", "status",
                       "content_type", "redirect_location",
                       "image_id"]].copy()
            out["links"] = out_links
            yield out

    return fetched.select(*cols).mapInPandas(gen, schema)


def explode_page_links(staged: DataFrame,
                       with_found: bool = False) -> DataFrame:
    """Staged page rows → LINKS_CANON_MIN link rows (plus href_norm in
    log mode): the downstream half of attach_links_canonical. Pure
    built-ins — explode drops link-less pages."""
    extra = [F.col("l.href_norm").alias("href_norm")] if with_found else []
    return (
        staged.select(
            F.col("url_norm").alias("src_url"),
            F.col("authority").alias("src_authority"),
            "depth", F.explode("links").alias("l"))
        .select("src_url", "src_authority", "depth",
                F.col("l.url_resolved").alias("url_resolved"),
                F.col("l.url_norm").alias("url_norm"),
                F.col("l.authority").alias("authority"),
                F.col("l.host").alias("host"), *extra)
    )


def explode_links(fetched: DataFrame, src_url_col: str = "url_norm",
                  src_raw_col: str = "url_raw",
                  body_col: str = "body",
                  record_redirects: bool = False,
                  passthrough: tuple[str, ...] = ()) -> DataFrame:
    """fetched pages → `links(src_url, src_raw, href_raw, *passthrough)`.

    P3 (reference crawler.py:120-128): when record_redirects is on and
    the page is a 3xx, the Location header is the page's only link;
    otherwise links come from the HTML body. ``passthrough`` columns
    (e.g. the source row's authority/depth) ride along un-renamed.
    """
    if record_redirects:
        hrefs = F.when(
            (F.col("status") >= 300) & (F.col("status") < 400)
            & F.col("redirect_location").isNotNull(),
            F.array(F.col("redirect_location")),
        ).otherwise(extract_hrefs(F.col(body_col)))
    else:
        hrefs = extract_hrefs(F.col(body_col))
    return (
        fetched.withColumn("_hrefs", hrefs)
        .select(
            F.col(src_url_col).alias("src_url"),
            F.col(src_raw_col).alias("src_raw"),
            *[F.col(c) for c in passthrough],
            F.explode("_hrefs").alias("href_raw"),
        )
    )


def extract_sitemap_entries(df: DataFrame, body_col: str = "body", *,
                            id_cols: tuple[str, ...] = ()) -> DataFrame:
    """Sitemap-protocol seed discovery: explode sitemap XML bodies
    into (loc, lastmod) rows — pure JVM string machinery, no XML
    parser, no Python.

    The reference discovers URLs only from anchor tags
    (parser.py AnchorTagParser); a production frontier also bootstraps
    from /sitemap.xml (the sitemaps.org protocol robots.txt points
    at). ``lastmod`` feeds straight into
    operators/freshness.py::recrawl_priority as a change signal.

    Semantics (exact, both engines — q_sitemap twins it):
      * the body splits on ``</url>`` or ``</sitemap>`` closers, so
        both urlset files and sitemapindex files explode one row per
        entry;
      * per block, the FIRST ``<loc>…</loc>`` is the entry URL
        (surrounding whitespace trimmed), the first
        ``<lastmod>…</lastmod>`` its optional timestamp — blocks
        without a loc (preamble, trailing close tags) emit nothing;
      * lastmod is returned as a trimmed raw string (W3C datetime
        parsing is the caller's step: formats vary and a bad date
        must not drop the URL); blocks without lastmod carry NULL.

    Regex-over-XML is deliberate and bounded here: sitemap files are
    machine-generated, schema-fixed, and size-capped by the protocol
    (50k URLs / 50 MB per file) — the failure modes that break
    regex-on-HTML (hand-written nesting, comments, script islands)
    are out of contract, and entries inside XML comments are accepted
    as-is (documented; a strict parser would need a real XML decoder,
    which is the same Arrow-batch seam as the HTML path).

    Scale shape: split + transform + filter + explode in one codegen
    span over the fetch stage's rows — row-local, no shuffle; the
    downstream canonicalize → seen anti-join is the crawl round's
    existing machinery.
    """
    blocks = F.split(F.col(body_col), "</url>|</sitemap>")
    entries = F.filter(
        F.transform(
            blocks,
            lambda b: F.struct(
                F.trim(F.regexp_extract(b, r"<loc>([^<]*)</loc>", 1))
                .alias("loc"),
                F.trim(F.regexp_extract(
                    b, r"<lastmod>([^<]*)</lastmod>", 1))
                .alias("lastmod"))),
        lambda s: s["loc"] != F.lit(""))
    out = df.select(*id_cols, F.explode(entries).alias("_e"))
    return out.select(
        *id_cols,
        F.col("_e.loc").alias("loc"),
        F.when(F.col("_e.lastmod") != "", F.col("_e.lastmod"))
        .alias("lastmod"))


class _AnchorTextCollector(HTMLParser):
    """Collect (href, anchor text) pairs in document order: text is
    the concatenated character data between <a href=…> and its
    close (nested markup stripped, entities unescaped by HTMLParser,
    whitespace runs collapsed). Unclosed anchors close at EOF."""

    def __init__(self):
        super().__init__()
        self.pairs: list[tuple[str, str]] = []
        self._href: str | None = None
        self._buf: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            self._flush()
            for name, value in attrs:
                if name == "href" and value is not None:
                    self._href = value
                    self._buf = []
                    break

    def handle_endtag(self, tag):
        if tag == "a":
            self._flush()

    def handle_data(self, data):
        if self._href is not None:
            self._buf.append(data)

    def _flush(self):
        if self._href is not None:
            text = " ".join("".join(self._buf).split())
            self.pairs.append((self._href, text))
            self._href = None
            self._buf = []

    def close(self):
        super().close()
        self._flush()


def anchor_pairs_from_html(html: str) -> list[tuple[str, str]]:
    """Pure-Python core for anchor-text harvesting (the offline
    ranking/captioning signal; the reference's AnchorTagParser keeps
    hrefs only — parser.py:11-56 — so text is an engine extension,
    kept OUT of the crawl's fused parse stage)."""
    c = _AnchorTextCollector()
    try:
        c.feed(html)
        c.close()
    except Exception:
        pass  # parity: bad HTML ignored (parser.py:39-42)
    return c.pairs


@F.pandas_udf(T.ArrayType(T.StructType([
    T.StructField("href", T.StringType()),
    T.StructField("text", T.StringType())])))
def extract_anchor_pairs(bodies: pd.Series) -> pd.Series:
    """Arrow-batch (href, text) extraction — same executor-side
    stdlib-parser discipline as extract_hrefs."""
    return pd.Series([
        None if body is None else anchor_pairs_from_html(body)
        for body in bodies])


# --- <meta name=robots> directives ------------------------------------------

# both attribute orders; content value carved up to quote/'>'
_META_NAME_FIRST = (r'(?is)<meta\s[^>]*name\s*=\s*["\']?robots["\']?'
                    r'[^>]*?content\s*=\s*["\']([^"\'>]*)')
_META_CONTENT_FIRST = (r'(?is)<meta\s[^>]*content\s*=\s*["\']'
                       r'([^"\'>]*)["\'][^>]*name\s*=\s*["\']?robots')


def meta_robots_expr(body) -> dict:
    """Page-level robots directives from ``<meta name="robots">``
    (the robots.txt protocol's in-page half — robotstxt.org's meta
    extension; a compliant crawler honours BOTH): returns
    {"noindex", "nofollow"} boolean Columns. ``none`` means both.
    Handles either attribute order, optional quoting, any case, and
    whitespace in the directive list. Pure JVM regex — one narrow
    projection over the already-fetched body, fused into the same
    stage as link extraction at zero extra passes."""
    if isinstance(body, str):
        body = F.col(body)
    raw = F.coalesce(
        F.nullif(F.regexp_extract(body, _META_NAME_FIRST, 1),
                 F.lit("")),
        F.nullif(F.regexp_extract(body, _META_CONTENT_FIRST, 1),
                 F.lit("")),
        F.lit(""))
    directives = F.concat(
        F.lit(","), F.regexp_replace(F.lower(raw), r"\s+", ""),
        F.lit(","))
    noindex = (directives.contains(",noindex,")
               | directives.contains(",none,"))
    nofollow = (directives.contains(",nofollow,")
                | directives.contains(",none,"))
    return {"noindex": noindex, "nofollow": nofollow}


_CANONICAL_HREF_FIRST = (r'(?is)<link\s[^>]*href\s*=\s*["\']([^"\'>]+)'
                         r'["\'][^>]*rel\s*=\s*["\']?canonical')
_CANONICAL_REL_FIRST = (r'(?is)<link\s[^>]*rel\s*=\s*["\']?canonical'
                        r'["\']?[^>]*href\s*=\s*["\']([^"\'>]+)')


def rel_canonical_expr(body):
    """The page's self-declared canonical URL from
    ``<link rel="canonical" href="...">`` — the dedup signal search
    engines honour before any content hashing: two fetched URLs that
    declare the same canonical are the SAME document, so a corpus
    pipeline groups on coalesce(canonical, fetched_url) ahead of the
    fingerprint families. Handles either attribute order and optional
    quoting (the meta_robots_expr two-regex discipline); returns the
    raw href (resolution against the fetch URL belongs to
    functions/canonical.py resolve, like every other extracted link).
    Pure JVM regex, fuse-able into the fetch projection."""
    if isinstance(body, str):
        body = F.col(body)
    return F.nullif(F.coalesce(
        F.nullif(F.regexp_extract(body, _CANONICAL_REL_FIRST, 1),
                 F.lit("")),
        F.nullif(F.regexp_extract(body, _CANONICAL_HREF_FIRST, 1),
                 F.lit("")),
        F.lit("")), F.lit(""))


_CHARSET_RE = r"""(?is)<meta[^>]*charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)"""
_HTML_LANG_RE = r"""(?is)<html[^>]*\slang\s*=\s*["']?([A-Za-z\-]+)"""


def html_charset_expr(body):
    """Declared character set of a page: matches both
    ``<meta charset=utf-8>`` (HTML5) and the HTTP-equiv form
    ``<meta http-equiv="Content-Type" content="text/html;
    charset=iso-8859-1">`` — one case-insensitive regex (the
    ``charset=`` attribute/parameter is the common token), lowercased,
    NULL when undeclared. The pre-decode gate for archive payloads:
    at 100 TB you route bytes to the right decoder BEFORE any text
    operator runs, exactly like sniff_format_expr gates image codecs.
    Pure JVM regex, fused into the fetch projection."""
    if isinstance(body, str):
        body = F.col(body)
    return F.nullif(F.lower(F.regexp_extract(body, _CHARSET_RE, 1)),
                    F.lit(""))


def html_lang_expr(body):
    """Declared document language from ``<html lang="...">`` —
    the author-asserted signal that corpus pipelines cross-check
    against content-based language ID (lang_id_expr /
    lang_id_multi_expr); a mismatch is itself a quality feature.
    Returns the lowercased primary subtag ('en-US' → 'en'), NULL when
    undeclared. Pure JVM regex."""
    if isinstance(body, str):
        body = F.col(body)
    tag = F.lower(F.regexp_extract(body, _HTML_LANG_RE, 1))
    return F.nullif(F.split(tag, "-")[0], F.lit(""))


# --- WET-style visible-text extraction -------------------------------------

# tags whose TEXT CONTENT is invisible (script/style are CDATA to
# HTMLParser, so their payload arrives as one handle_data call)
_SKIP_TEXT_TAGS = {"script", "style", "noscript", "template"}

# tags that delimit text blocks (WET convention: block-level markup
# becomes a line break; inline markup — a, b, i, span, em, code … —
# contributes nothing)
_BLOCK_TAGS = {
    "html", "head", "body", "title", "h1", "h2", "h3", "h4", "h5",
    "h6", "p", "div", "section", "article", "header", "footer",
    "nav", "aside", "ul", "ol", "li", "dl", "dt", "dd", "table",
    "thead", "tbody", "tr", "td", "th", "br", "hr", "blockquote",
    "pre", "form", "main", "figure", "figcaption",
}

_BREAK = "\x00"  # block sentinel: can't collide with source newlines


class _VisibleTextCollector(HTMLParser):
    """Visible text in document order: skip script/style/noscript/
    template content, break blocks at block-level tags, unescape
    entities (HTMLParser does), collapse whitespace within a block,
    drop empty blocks, join blocks with newline."""

    def __init__(self):
        super().__init__()
        self._skip = 0
        self._parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TEXT_TAGS:
            self._skip += 1
        elif tag in _BLOCK_TAGS:
            self._parts.append(_BREAK)

    def handle_endtag(self, tag):
        if tag in _SKIP_TEXT_TAGS:
            self._skip = max(0, self._skip - 1)
        elif tag in _BLOCK_TAGS:
            self._parts.append(_BREAK)

    def handle_data(self, data):
        if not self._skip:
            self._parts.append(data)

    def text(self) -> str:
        blocks = "".join(self._parts).split(_BREAK)
        collapsed = (" ".join(b.split()) for b in blocks)
        return "\n".join(b for b in collapsed if b)


def text_from_html(html: str) -> str:
    """Pure-Python core of WET extraction (Common Crawl's WET files
    are exactly this: the WARC response payloads re-emitted as
    extracted visible text — the ingest format of every open
    pretraining corpus). Same stdlib-parser parity discipline as
    hrefs (reference parser.py:11-56 keeps hrefs only; text is the
    engine's corpus-side extension). Bad HTML is best-effort, never
    an exception."""
    c = _VisibleTextCollector()
    try:
        c.feed(html)
        c.close()
    except Exception:
        pass  # parity: bad HTML ignored (parser.py:39-42)
    return c.text()


@F.pandas_udf(T.StringType())
def extract_visible_text(bodies: pd.Series) -> pd.Series:
    """Arrow-batch WET extraction over a body column. One narrow
    stage, features-sized output (text, not markup) — at 100 TB this
    runs fused with the fetch/decode pass and is what feeds every
    downstream text operator (clean_corpus, dedup, quality)."""
    return pd.Series([
        None if body is None else text_from_html(body)
        for body in bodies])


class _MainTextCollector(HTMLParser):
    """Block-level visible text WITH per-block anchor accounting —
    the input to jusText/boilerpipe-style link-density filtering:
    navigation, footers, and tag clouds are blocks whose text is
    mostly inside <a>; article prose is not."""

    def __init__(self):
        super().__init__()
        self._skip = 0
        self._adepth = 0
        self._parts: list = []  # (data, in_anchor) | None block break

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TEXT_TAGS:
            self._skip += 1
        elif tag == "a":
            self._adepth += 1
        elif tag in _BLOCK_TAGS:
            self._parts.append(None)

    def handle_endtag(self, tag):
        if tag in _SKIP_TEXT_TAGS:
            self._skip = max(0, self._skip - 1)
        elif tag == "a":
            self._adepth = max(0, self._adepth - 1)
        elif tag in _BLOCK_TAGS:
            self._parts.append(None)

    def handle_data(self, data):
        if not self._skip:
            self._parts.append((data, self._adepth > 0))

    def blocks(self) -> list[tuple[str, int, int]]:
        """[(collapsed_text, total_nonws_chars, anchor_nonws_chars)]
        per non-empty block."""
        out, cur = [], []
        for p in self._parts + [None]:
            if p is not None:
                cur.append(p)
                continue
            if cur:
                text = " ".join("".join(d for d, _ in cur).split())
                total = sum(len("".join(d.split())) for d, _ in cur)
                anchor = sum(len("".join(d.split()))
                             for d, a in cur if a)
                if text:
                    out.append((text, total, anchor))
                cur = []
        return out


def main_text_from_html(html: str, min_chars: int = 10,
                        max_link_density: float = 0.5) -> str:
    """jusText/boilerpipe-style MAIN-CONTENT extraction: keep only
    blocks that read like prose — at least ``min_chars``
    non-whitespace characters and anchor-text share at most
    ``max_link_density`` of them. Navigation bars, footers, and tag
    clouds (text mostly inside <a>) drop; article paragraphs
    survive. The within-page complement of the cross-document
    strip_boilerplate: no corpus state, decided per page.

    Density compares exactly: anchor_chars <= max_link_density *
    total_chars evaluated as 2*anchor <= total for the 0.5 default
    (exact integer; the oracle replays it)."""
    c = _MainTextCollector()
    try:
        c.feed(html)
        c.close()
    except Exception:
        pass  # parity: bad HTML ignored (parser.py:39-42)
    kept = [t for t, total, anchor in c.blocks()
            if total >= min_chars
            and anchor <= max_link_density * total]
    return "\n".join(kept)


@F.pandas_udf(T.StringType())
def extract_main_text(bodies: pd.Series) -> pd.Series:
    """Arrow-batch main-content extraction (see main_text_from_html):
    one narrow stage beside extract_visible_text — the pre-cleaning
    step that keeps chrome out of the corpus BEFORE any cross-doc
    dedup/boilerplate machinery runs."""
    return pd.Series([
        None if body is None else main_text_from_html(body)
        for body in bodies])


def anchor_text_agg(pairs: DataFrame, href_col: str = "href",
                    text_col: str = "text") -> DataFrame:
    """Aggregate harvested anchor pairs into the per-target signal
    table: (href, n_refs, n_texts, top_text) where top_text is the
    modal anchor string (count DESC, text ASC tie-break) — the
    classic anchor-text relevance feature (and, for the image graft,
    the caption candidate for a linked asset).

    Scale shape: one (href, text)-grain partial-count agg, then a
    per-href window over the already-aggregated distinct-text rows —
    state per href is its distinct anchor TEXT set, not its raw link
    count, so hub pages with millions of identical "click here" rows
    collapse map-side before any shuffle."""
    from pyspark.sql import Window

    per_text = pairs.groupBy(
        F.col(href_col).alias("href"),
        F.col(text_col).alias("text")).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("href").orderBy(
        F.col("cnt").desc(), F.col("text").asc())
    return (per_text
            .withColumn("_rn", F.row_number().over(w))
            .groupBy("href")
            .agg(F.sum("cnt").alias("n_refs"),
                 F.count("*").alias("n_texts"),
                 F.max(F.when(F.col("_rn") == 1, F.col("text")))
                 .alias("top_text")))
