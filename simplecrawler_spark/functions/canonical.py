"""URL canonicalisation — the engine's scalar-function family F1–F17.

Semantics are pinned to the reference's normalisation module
(/root/reference/simple_crawler/url_normalisation.py:20-242 and
hyperlink.py:17-124); parity is achieved by calling the *same* stdlib
primitives (`urllib.parse.quote/quote_plus/urlsplit/urljoin`) inside
Arrow-batched pandas UDFs, never by re-implementing the quoting rules.
Spark's built-in `url_encode` is quote_plus with the wrong safe-set, so
it cannot be used for path/query normalisation.

Design (SURVEY.md §2.2 F8): ONE pandas UDF produces the whole
canonical struct `(url_norm, scheme, authority, host, path, query,
fragment)` in a single Arrow pass — cheaper than five separate UDF
calls — and the 64-bit key is the built-in `F.xxhash64(url_norm)`
(JVM-side, whole-stage codegen friendly).

At 100 TB scale this function runs once per discovered link; the Arrow
batch boundary is the only Python crossing per ~10k URLs.
"""

from __future__ import annotations

import re
from urllib.parse import quote, quote_plus, urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Identity fast path for canon_parts: URLs this regex accepts are
# PROVABLY fixed points of the full normalisation — lowercase http(s)
# scheme, lowercase dot-separated host (no leading/trailing dot, no
# userinfo, no port), a present path of chars that
# quote(safe="/%") leaves untouched (unreserved + '/' + '%'; note '+'
# and ' ' are absent), no query, no fragment. For such URLs
# normalise_url(url) == url and the components read off directly.
# Anything else falls through to the exact stdlib path. At crawl scale
# the overwhelming majority of discovered links hit this path, cutting
# the per-link Python cost ~10x without any semantic drift.
_CANON_FIXED_POINT = re.compile(
    r"^(https?)://([a-z0-9-]+(?:\.[a-z0-9-]+)*)(/[A-Za-z0-9/_.~%-]*)$")

# ---------------------------------------------------------------------------
# Pure-Python core (shared by driver-side constant folding and the UDFs)
# ---------------------------------------------------------------------------


def canon_authority(netloc: str) -> str:
    """Normalise `userinfo@host` (reference url_normalisation.py:82-122).

    Lowercases the host, strips surrounding dots, strips surrounding
    ':' from userinfo, and drops an empty userinfo entirely.
    """
    if netloc == "":
        return ""
    userinfo, sep, host = netloc.partition("@")
    if not sep:
        userinfo, host = "", netloc
    userinfo = userinfo.strip(":")
    host = host.lower().strip(".")
    return f"{userinfo}@{host}" if userinfo else host


def canon_query(query: str, sort_params: bool = True) -> str:
    """quote_plus with safe=':&=' then lexicographic param sort
    (reference url_normalisation.py:147-182)."""
    query = quote_plus(query, safe=":&=")
    if sort_params:
        return "&".join(sorted(query.split("&")))
    return query


def canon_path(path: str) -> str:
    """quote with safe='/%' and a guaranteed leading slash
    (reference url_normalisation.py:125-144; '%' is NOT re-encoded)."""
    path = quote(path, safe="/%")
    return path if path.startswith("/") else "/" + path


def canon_fragment(fragment: str) -> str:
    """quote_plus with safe=':~' (reference url_normalisation.py:185-207)."""
    return quote_plus(fragment, safe=":~")


def canon_scheme(scheme: str) -> str:
    """lowercase (reference url_normalisation.py:20-35)."""
    return scheme.lower()


def canon_host(host: str) -> str:
    """lowercase + strip surrounding dots (reference url_normalisation.py:38-58)."""
    return host.lower().strip(".")


def canon_userinfo(userinfo: str) -> str:
    """strip surrounding ':' (reference url_normalisation.py:61-79)."""
    return userinfo.strip(":")


_COMPONENT_FNS = {
    "scheme": canon_scheme,
    "authority": canon_authority,
    "host": canon_host,
    "userinfo": canon_userinfo,
    "path": canon_path,
    "query": canon_query,
    "fragment": canon_fragment,
}


def canon_component(name: str, value: str) -> str:
    """Driver-side constant normalisation for filter predicates —
    the reference normalises filter kwargs before comparing
    (url_normalisation.py:245-263, used by HyperlinkSet.filter_by
    hyperlink.py:195-209). We fold the constant once on the driver
    instead of normalising it per row."""
    return _COMPONENT_FNS[name](value)


def canon_parts(raw: str) -> tuple[str, str, str, str, str, str, str]:
    """Full canonicalisation of one raw URL.

    Matches reference `normalise_url` (url_normalisation.py:210-242):
    root-relative resolution of scheme-less urls via urljoin('/', url),
    then urlsplit, per-component normalisation, urlunsplit.

    Returns (url_norm, scheme, authority, host, path, query, fragment).
    `host` is the authority minus userinfo (port kept — the reference
    never normalises ports, url_normalisation.py:121 todo) and is the
    politeness/partitioning key downstream.
    """
    m = _CANON_FIXED_POINT.match(raw)
    if m:
        scheme, host, path = m.groups()
        return raw, scheme, host, host, path, "", ""
    rooted = urljoin("/", raw)
    s = urlsplit(rooted)
    scheme = s.scheme.lower()
    authority = canon_authority(s.netloc)
    path = canon_path(s.path)
    query = canon_query(s.query)
    fragment = canon_fragment(s.fragment)
    url_norm = urlunsplit((scheme, authority, path, query, fragment))
    host = authority.partition("@")[2] or authority
    return url_norm, scheme, authority, host, path, query, fragment


def trim_raw(raw: str, *, scheme=False, authority=False, path=False,
             query=False, fragment=False) -> str:
    """Rebuild a RAW url with selected raw components blanked — the
    reference's Hyperlink.trim (hyperlink.py:60-81). Operates on raw
    components; the result is re-canonicalised later by canon_parts.
    """
    s = urlsplit(raw)
    return urlunsplit((
        "" if scheme else s.scheme,
        "" if authority else s.netloc,
        "" if path else s.path,
        "" if query else s.query,
        "" if fragment else s.fragment,
    ))


def resolve_raw(base_raw: str, href_raw: str) -> str:
    """RFC 3986 resolution on RAW urls (reference Hyperlink.join,
    hyperlink.py:115-124 — resolution uses `_input_url`, never the
    normalised form; trailing-dot hosts etc. must survive to here)."""
    return urljoin(base_raw, href_raw)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

CANON_STRUCT = T.StructType([
    T.StructField("url_norm", T.StringType()),
    T.StructField("scheme", T.StringType()),
    T.StructField("authority", T.StringType()),
    T.StructField("host", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("query", T.StringType()),
    T.StructField("fragment", T.StringType()),
])


@F.pandas_udf(CANON_STRUCT)
def canonicalize(urls: pd.Series) -> pd.DataFrame:
    """Arrow-batched canonicaliser: raw url → canonical struct."""
    cols = ("url_norm", "scheme", "authority", "host", "path", "query",
            "fragment")
    out = {c: [] for c in cols}
    for raw in urls:
        if raw is None:
            for c in cols:
                out[c].append(None)
            continue
        parts = canon_parts(raw)
        for c, v in zip(cols, parts):
            out[c].append(v)
    return pd.DataFrame(out)


@F.pandas_udf(T.StringType())
def resolve(base_raw: pd.Series, href_raw: pd.Series) -> pd.Series:
    """Arrow-batched urljoin over (base, href) raw-string pairs —
    columnar map, NOT a relational join (SURVEY.md §2.3 R2)."""
    return pd.Series([
        None if b is None or h is None else urljoin(b, h)
        for b, h in zip(base_raw, href_raw)
    ])


def trim_query_fragment_expr(url: Column, trim_query: bool = True,
                             trim_fragment: bool = True) -> Column:
    """Fast JVM-side path for the crawl loop's only trim use:
    `trim(query=…, fragment=…)` (reference crawler.py:136). Stripping
    the first '#'-suffix then the first '?'-suffix of the RAW string is
    exactly urlunsplit with those components blanked, with zero Python.

    Only valid for the (query, fragment) subset; general trims go
    through `trim_raw` in the resolve UDF path.
    """
    if not trim_query and not trim_fragment:
        return url
    # urlsplit takes the fragment as everything after the FIRST '#',
    # and the query as the span between the first '?' and the fragment;
    # split the fragment off first so a '?' inside a kept fragment is
    # never mis-treated as a query.
    before_frag = F.substring_index(url, "#", 1)
    kept_frag = (
        F.lit("") if trim_fragment
        else F.when(
            F.instr(url, "#") > 0,
            F.concat(F.lit("#"), F.substr(url, F.instr(url, "#") + 1)),
        ).otherwise(F.lit(""))
    )
    kept_head = (
        F.substring_index(before_frag, "?", 1) if trim_query else before_frag
    )
    return F.concat(kept_head, kept_frag)


def url_hash(url_norm: Column) -> Column:
    """64-bit key for seen-set membership (BASELINE.json:6 mandates
    xxhash64 keying; the reference has no hashing beyond Python hash,
    hyperlink.py:96-97)."""
    return F.xxhash64(url_norm)


def canonicalize_df(df: DataFrame, url_col: str = "url_raw",
                    keep_struct: bool = False) -> DataFrame:
    """Attach canonical columns + url_hash to ``df`` in one Arrow pass.

    Adds: url_norm, scheme, authority, host, path, query, fragment,
    url_hash. The struct is projected immediately so downstream
    filters/joins see plain columns (column pruning + predicate
    pushdown stay effective).
    """
    struct_col = "_canon"
    out = df.withColumn(struct_col, canonicalize(F.col(url_col)))
    for field in CANON_STRUCT.fieldNames():
        out = out.withColumn(field, F.col(f"{struct_col}.{field}"))
    out = out.withColumn("url_hash", url_hash(F.col("url_norm")))
    if not keep_struct:
        out = out.drop(struct_col)
    return out


def domain_expr(scheme: Column, authority: Column) -> Column:
    """scheme://authority (reference Hyperlink.domain, hyperlink.py:54-58)."""
    return F.concat_ws("://", scheme, authority)


def filter_by(df: DataFrame, url_col: str | None = None, **kwargs) -> DataFrame:
    """R3 general multi-kwarg filter (reference HyperlinkSet.filter_by,
    hyperlink.py:195-209): keep rows whose normalised URL components
    equal the normalised constants.

    Each constant is folded ONCE on the driver with the same
    per-component normalisers the reference applies to its kwargs
    (normalise_kwargs, url_normalisation.py:245-263); the row-side
    comparison is then a plain JVM equality over the canonical
    component columns — whole-stage codegen, no per-row Python, and
    Catalyst pushes the predicates into the scan.

    ``df`` must already carry the canonical component columns
    (canonicalize_df / extract_links_canonical); pass ``url_col`` to
    canonicalise a raw-url column first. Supported kwargs: scheme,
    authority, host, path, query, fragment.
    """
    if url_col is not None:
        df = canonicalize_df(df, url_col=url_col)
    cond = F.lit(True)
    for name, value in kwargs.items():
        if name not in _COMPONENT_FNS or name == "userinfo":
            raise TypeError(f"cannot filter_by {name!r}")
        cond = cond & (F.col(name) == F.lit(canon_component(name, value)))
    return df.filter(cond)


def with_path_expr(scheme: Column, authority: Column, path) -> Column:
    """F13 general with_path (reference hyperlink.py:83-85):
    ``domain.url + path`` — the normalised domain always ends in '/'
    (normalise_path of ''), and the path is appended VERBATIM, exactly
    like the reference (with_path('/x') yields '//x' there too)."""
    p = F.lit(path) if isinstance(path, str) else path
    return F.concat(scheme, F.lit("://"), authority, F.lit("/"), p)


def url_add_expr(url: Column, other) -> Column:
    """F14 ``Hyperlink.__add__`` (hyperlink.py:99-100): raw string
    concatenation of url + other."""
    o = F.lit(other) if isinstance(other, str) else other
    return F.concat(url, o)


def url_div_expr(url: Column, other) -> Column:
    """F14 ``Hyperlink.__truediv__`` (hyperlink.py:102-103):
    url + '/' + other on the raw strings."""
    o = F.lit(other) if isinstance(other, str) else other
    return F.concat(url, F.lit("/"), o)


def is_absolute_expr(scheme: Column) -> Column:
    """Absolute ⟺ scheme non-empty (reference hyperlink.py:105-113;
    note '//host/x' counts as relative under this rule)."""
    return scheme != F.lit("")


def surt_key_expr(host: Column, path, query=None) -> Column:
    """SURT-style sort key (Sort-friendly URI Reordering Transform —
    the Internet Archive / OpenWayback CDX index convention): the
    host's labels reversed and comma-joined, then the path (and
    optionally '?query'), e.g. ``news.example.com/a/b`` →
    ``com,example,news)/a/b``.

    Why it exists: lexicographic order on SURT keys clusters every
    URL of a registrable domain (and all its subdomains) into one
    contiguous key range, so a 10^10-row URL index written
    sorted/bucketed by this column answers "everything under
    example.com" as a RANGE SCAN with file-level min/max pruning —
    plain url_norm order scatters subdomains across the keyspace.
    Port numbers are dropped (CDX convention); the caller passes the
    already-canonical host (lowercase, no trailing dot — F3's
    output).

    Pure JVM: split + reverse + array_join + concat; one narrow
    expression (q_surt_keys twins it in DuckDB)."""
    rev = F.array_join(
        F.reverse(F.split(F.regexp_replace(host, ":.*$", ""),
                          r"\.")), ",")
    key = F.concat(rev, F.lit(")"),
                   F.coalesce(path, F.lit("")))
    if query is not None:
        key = F.concat(
            key,
            F.when((query.isNotNull()) & (query != ""),
                   F.concat(F.lit("?"), query)).otherwise(F.lit("")))
    return key
