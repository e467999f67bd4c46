"""F1–F17 canonicalisation parity tests.

Ports the reference's parametrized tables
(/root/reference/tests/test_hyperlink.py:7-137) and the doctest pairs
in url_normalisation.py as DataFrame-level tests over the canonicalize
/ resolve UDFs, plus pure-Python spot checks.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simplecrawler_spark.functions import canonical as C

# (raw, normalised) — test_hyperlink.py:7-39 + :119-137 + doctests
NORM_TABLE = [
    ("/", "/"),
    (".", "/"),
    ("example", "/example"),
    ("/example", "/example"),
    ("www.example.html", "/www.example.html"),
    ("#hello", "/#hello"),
    ("/#hello", "/#hello"),
    ("example#hello", "/example#hello"),
    ("/example#hello", "/example#hello"),
    ("?hello=world", "/?hello=world"),
    ("/?hello=world", "/?hello=world"),
    ("https://www.example.com/", "https://www.example.com/"),
    ("https://www.example.com.", "https://www.example.com/"),
    ("https://www.example.com/example", "https://www.example.com/example"),
    ("https://www.example.com#hello", "https://www.example.com/#hello"),
    ("https://www.example.com/#hello", "https://www.example.com/#hello"),
    ("https://www.example.com/example#hello", "https://www.example.com/example#hello"),
    ("https://www.example.com?hello=world", "https://www.example.com/?hello=world"),
    ("https://www.example.com/?hello=world", "https://www.example.com/?hello=world"),
    # normalisation-heavy rows (test_hyperlink.py:119-137)
    ("/ hello world", "/%20hello%20world"),
    ("/example!@£$%^&*()", "/example%21%40%C2%A3%24%%5E%26%2A%28%29"),
    ("www.EXAMPLE.html", "/www.EXAMPLE.html"),
    ("HTTPS://WWW.eXaMpLe.cOm/", "https://www.example.com/"),
    ("?hello=world+hello world", "/?hello=world%2Bhello+world"),
    ("/hello-world?hello=world+hello+world", "/hello-world?hello=world%2Bhello%2Bworld"),
    ("/?world=hello&hello=world", "/?hello=world&world=hello"),
    # doctest pairs (url_normalisation.py:217-230)
    ("", "/"),
    ("www.EXAMPLE.com?hello=world", "/www.EXAMPLE.com?hello=world"),
    ("http://www.EXAMPLE.com?hello=world", "http://www.example.com/?hello=world"),
    ("http://@example.com#hello", "http://example.com/#hello"),
    (
        "http://hello:@example.com/hello/world?hello=world&world=hello#hi",
        "http://hello@example.com/hello/world?hello=world&world=hello#hi",
    ),
    (
        "HTTPS://HELLO.WORLD@EXAMPLE.CO.UK/ hi there",
        "https://HELLO.WORLD@example.co.uk/%20hi%20there",
    ),
    ("?world=hello&hello=world", "/?hello=world&world=hello"),
]

# (href, expected-suffix-appended-to-base) — test_hyperlink.py:72-92
JOIN_RELATIVE = [
    ("/", "/"),
    (".", "/"),
    ("example", "/example"),
    ("/example", "/example"),
    ("www.example.html", "/www.example.html"),
    ("#hello", "/#hello"),
    ("/#hello", "/#hello"),
    ("example#hello", "/example#hello"),
    ("/example#hello", "/example#hello"),
    ("?hello=world", "/?hello=world"),
    ("/?hello=world", "/?hello=world"),
]

JOIN_ABSOLUTE = [
    ("https://www.example.com/", "https://www.example.com/"),
    ("https://www.example.com.", "https://www.example.com/"),
    ("https://www.example.com/example", "https://www.example.com/example"),
    ("https://www.example.com#hello", "https://www.example.com/#hello"),
    ("https://www.example.com/#hello", "https://www.example.com/#hello"),
    ("https://www.example.com/example#hello", "https://www.example.com/example#hello"),
    ("https://www.example.com?hello=world", "https://www.example.com/?hello=world"),
    ("https://www.example.com/?hello=world", "https://www.example.com/?hello=world"),
]


def test_canon_parts_pure_python():
    for raw, expected in NORM_TABLE:
        assert C.canon_parts(raw)[0] == expected, raw


def test_canonicalize_udf(spark):
    df = spark.createDataFrame([(r,) for r, _ in NORM_TABLE], ["url_raw"])
    out = C.canonicalize_df(df).select("url_raw", "url_norm").collect()
    got = {r.url_raw: r.url_norm for r in out}
    for raw, expected in NORM_TABLE:
        assert got[raw] == expected, raw


def test_canonicalize_components(spark):
    df = spark.createDataFrame(
        [("HTTPS://HELLO:@WWW.EXAMPLE.COM./a b?z=y&a=b#frag one",)], ["url_raw"]
    )
    row = C.canonicalize_df(df).collect()[0]
    assert row.scheme == "https"
    # userinfo case is preserved (reference normalise_userinfo only
    # strips ':'; see doctest url_normalisation.py:228-229)
    assert row.authority == "HELLO@www.example.com"
    assert row.host == "www.example.com"
    assert row.path == "/a%20b"
    assert row.query == "a=b&z=y"
    assert row.fragment == "frag+one"
    assert row.url_norm == "https://HELLO@www.example.com/a%20b?a=b&z=y#frag+one"
    assert isinstance(row.url_hash, int)


def test_resolve_udf_relative_and_absolute(spark):
    base = "https://helloworld.com"
    rows = [(base, h, exp) for h, exp in JOIN_RELATIVE] + [
        (base, h, exp) for h, exp in JOIN_ABSOLUTE
    ]
    df = spark.createDataFrame(rows, ["base_raw", "href_raw", "expected"])
    out = (
        df.withColumn("resolved", C.resolve("base_raw", "href_raw"))
        .withColumn("c", C.canonicalize("resolved"))
        .select("href_raw", "c.url_norm", "expected")
        .collect()
    )
    for r in out:
        if r.expected.startswith("https://"):
            assert r.url_norm == r.expected, r.href_raw
        else:
            assert r.url_norm == base + r.expected, r.href_raw


@pytest.mark.parametrize(
    "url,tq,tf,expected",
    [
        ("https://e.com/a?x=1#f", True, True, "https://e.com/a"),
        ("https://e.com/a?x=1#f", True, False, "https://e.com/a#f"),
        ("https://e.com/a?x=1#f", False, True, "https://e.com/a?x=1"),
        ("https://e.com/a?x=1#f", False, False, "https://e.com/a?x=1#f"),
        ("https://e.com/a#f?x=1", True, False, "https://e.com/a#f?x=1"),
        ("https://e.com/a#f?x=1", True, True, "https://e.com/a"),
        ("https://e.com/a?", True, True, "https://e.com/a"),
        ("https://e.com/a#", False, True, "https://e.com/a"),
        ("plain", True, True, "plain"),
    ],
)
def test_trim_query_fragment_expr(spark, url, tq, tf, expected):
    df = spark.createDataFrame([(url,)], ["u"])
    got = df.select(
        C.trim_query_fragment_expr(F.col("u"), tq, tf).alias("t")
    ).collect()[0].t
    assert got == expected


def test_trim_raw_matches_reference_semantics():
    # Hyperlink.trim blanks raw components then re-normalises
    assert C.canon_parts(C.trim_raw("https://E.com/a?x=1#f", query=True, fragment=True))[0] == "https://e.com/a"
    assert C.canon_parts(C.trim_raw("https://E.com/a?x=1#f", scheme=True))[0] == "//e.com/a?x=1#f"


def test_component_constant_folding():
    # reference normalise_kwargs doctest (url_normalisation.py:252-254)
    assert C.canon_component("scheme", "HTTPS") == "https"
    assert C.canon_component("authority", "@example.com") == "example.com"
    assert C.canon_component("fragment", "hi") == "hi"
    assert C.canon_component("query", "z=y&a=b") == "a=b&z=y"
    assert C.canon_component("path", "hello world") == "/hello%20world"
    assert C.canon_component("userinfo", "hello:") == "hello"
    assert C.canon_component("host", "www.EXAMPLE.com.") == "www.example.com"


def test_is_absolute_expr(spark):
    rows = [(r,) for r, _ in NORM_TABLE]
    df = C.canonicalize_df(spark.createDataFrame(rows, ["url_raw"]))
    got = df.select("url_raw", C.is_absolute_expr(F.col("scheme")).alias("abs")).collect()
    for r in got:
        assert r.abs == r.url_raw.lower().startswith("http"), r.url_raw


# ---------------------------------------------------------------------------
# R3 filter_by — reference test tables ported verbatim
# (/root/reference/tests/test_hyperlink.py:193-262 single-kwarg,
# :275-363 multi-kwarg)
# ---------------------------------------------------------------------------

_FB_SINGLE = [
    (("scheme", "http"),
     ["http://www.google.com/", "/hello-world?hello=world", "#hello",
      "/?hello=world#hello", "https://www.example.com",
      "https://example.com/hello-world?world=hello"],
     ["http://www.google.com/"]),
    (("authority", ":@www.EXAMPLE.com."),
     ["/", "/hello-world?hello=world", "#hello", "/?hello=world#hello",
      "https://www.example.com",
      "https://www.example.com/hello-world?world=hello"],
     ["https://www.example.com",
      "https://www.example.com/hello-world?world=hello"]),
    (("path", "/hello-world"),
     ["/", "/hello-world?hello=world", "#hello", "/?hello=world#hello",
      "https://www.example.com",
      "https://example.com/hello-world?world=hello"],
     ["/hello-world?hello=world",
      "https://example.com/hello-world?world=hello"]),
    (("query", "hello=world"),
     ["/", "/hello-world?hello=world", "#hello", "/?hello=world#hello",
      "https://www.example.com", "https://example.com/?world=hello"],
     ["/hello-world?hello=world", "/?hello=world#hello"]),
    (("fragment", "hello"),
     ["/", "/hello-world?hello=world", "#goodbye", "/?hello=world#hello",
      "https://www.example.com", "https://example.com/#hello"],
     ["/?hello=world#hello", "https://example.com/#hello"]),
]

_FB_MULTI = [
    ({"scheme": "http", "authority": "www.example.com"},
     ["http://www.google.com./", "/hello-world?hello=world", "#hello",
      "/?hello=world#hello", "http://www.example.com",
      "https://example.com/hello-world?world=hello"],
     ["http://www.example.com"]),
    ({"authority": "www.example.com", "path": "/hello-world",
      "query": "world=hello"},
     ["/", "/hello-world?hello=world", "#hello", "/?hello=world#hello",
      "https://www.example.com",
      "https://www.example.com/hello-world?world=hello"],
     ["https://www.example.com/hello-world?world=hello"]),
    ({"path": "/hello", "query": "hello=world", "fragment": "here"},
     ["/hello?hello=world#here", "/hello-world?hello=world", "#hello",
      "/?hello=world#hello", "https://www.example.com",
      "https://yoyoyo.co.uk/hello?hello=world#here"],
     ["/hello?hello=world#here",
      "https://yoyoyo.co.uk/hello?hello=world#here"]),
    ({"scheme": "https", "authority": "www.example.com", "path": "/",
      "query": "", "fragment": ""},
     ["/", "/hello-world?hello=world", "#hello", "/?hello=world#hello",
      "https://www.example.com", "https://example.com/?world=hello"],
     ["https://www.example.com"]),
    ({"scheme": "HTTPS", "authority": "@www.example.com", "path": "/",
      "query": "", "fragment": ""},
     ["/", "/hello-world?hello=world", "#hello", "/?hello=world#hello",
      "https://www.yoyoyo.com", "https://example.com/?world=hello"],
     []),
]


@pytest.mark.parametrize("fields, input_links, output_links", _FB_SINGLE)
def test_filter_by_single_kwarg(spark, fields, input_links, output_links):
    k, v = fields
    df = spark.createDataFrame([(l,) for l in input_links], ["url_raw"])
    got = sorted(r.url_norm for r in
                 C.filter_by(df, url_col="url_raw", **{k: v}).collect())
    assert got == sorted(C.canon_parts(l)[0] for l in output_links)


@pytest.mark.parametrize("fields, input_links, output_links", _FB_MULTI)
def test_filter_by_multi_kwargs(spark, fields, input_links, output_links):
    df = spark.createDataFrame([(l,) for l in input_links], ["url_raw"])
    got = sorted(r.url_norm for r in
                 C.filter_by(df, url_col="url_raw", **fields).collect())
    assert got == sorted(C.canon_parts(l)[0] for l in output_links)


def test_filter_by_rejects_unknown_kwarg(spark):
    df = spark.createDataFrame([("/x",)], ["url_raw"])
    with pytest.raises(TypeError):
        C.filter_by(df, url_col="url_raw", port="80")


# ---------------------------------------------------------------------------
# F13/F14 sugar
# ---------------------------------------------------------------------------

def test_with_path_and_arith_sugar(spark):
    """F13 with_path + F14 __add__/__truediv__ (hyperlink.py:83-85,
    99-103) — reference usage patterns: domain.with_path('robots.txt'),
    url + str, url / segment (tests/test_crawler.py:163-203)."""
    df = C.canonicalize_df(spark.createDataFrame(
        [("HTTP://Example.COM./a/b?x=1",)], ["url_raw"]))
    row = df.select(
        C.with_path_expr(F.col("scheme"), F.col("authority"),
                         "robots.txt").alias("wp"),
        C.url_add_expr(F.col("url_norm"), "#frag").alias("added"),
        C.url_div_expr(F.lit("http://example.com"), "hello").alias("divd"),
    ).first()
    assert row.wp == "http://example.com/robots.txt"
    assert row.added == "http://example.com/a/b?x=1#frag"
    assert row.divd == "http://example.com/hello"
    # verbatim-append parity: a leading-slash path doubles the slash,
    # exactly like the reference's domain.url + path
    row2 = df.select(C.with_path_expr(
        F.col("scheme"), F.col("authority"), "/x").alias("wp")).first()
    assert row2.wp == "http://example.com//x"


def test_surt_key_expr(spark):
    """SURT keys (canonical.py surt_key_expr): reversed host labels,
    ')' separator, optional ?query; port dropped; subdomains of one
    domain sort contiguously."""
    from pyspark.sql import functions as F

    from simplecrawler_spark.functions.canonical import surt_key_expr

    rows = [
        (1, "news.example.com", "/a/b", "x=1"),
        (2, "example.com", "/", ""),
        (3, "example.com:8080", "/p", None),
        (4, "a.b.example.org", "", "q=2"),
        (5, "other.net", "/z", ""),
    ]
    df = spark.createDataFrame(
        rows, "id long, host string, path string, query string")
    got = {r.id: r.surt for r in df.select(
        "id", surt_key_expr(F.col("host"), F.col("path"),
                            F.col("query")).alias("surt")).collect()}
    assert got[1] == "com,example,news)/a/b?x=1"
    assert got[2] == "com,example)/"
    assert got[3] == "com,example)/p"             # port dropped
    assert got[4] == "org,example,b,a)?q=2"
    assert got[5] == "net,other)/z"
    # the index property: every example.com URL shares the range
    # prefix, so a sorted scan answers the domain query contiguously
    ex = sorted(v for v in got.values() if v.startswith("com,example"))
    allk = sorted(got.values())
    i = allk.index(ex[0])
    assert allk[i:i + len(ex)] == ex
