"""P1/P2 href-extraction tests — ports of
/root/reference/tests/test_parser.py:12-158 (single link, multi
no-dup, dedupe-by-normalised-form, uniqueness) at DataFrame level.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simplecrawler_spark.functions.canonical import canon_parts
from simplecrawler_spark.operators.parse import explode_links, hrefs_from_html

SINGLE_LINKS = [
    "https://example.com", "http://example.com", "mailto://example.com",
    "//example.com", "/", ".", "example", "example.html", "www.example.html",
    "../example.html", "#hello", "?hello=world", ".git", "/example",
    "/example.html", "/example#hello", "/example?hello=world&world=hello",
]


def make_html(body: str) -> str:
    return f"<html><head></head><body>{body}</body></html>"


def make_a_tags(paths) -> str:
    return "<br>".join(f'<a href="{p}">link</a>' for p in paths)


def norm(u: str) -> str:
    return canon_parts(u)[0]


@pytest.mark.parametrize("link", SINGLE_LINKS)
def test_single_link(link):
    html = make_html(make_a_tags([link]))
    assert [norm(h) for h in hrefs_from_html(html)] == [norm(link)]


def test_multiple_links_no_duplicates():
    links = ["https://example.com", "/example", "/example.html",
             "/example#hello", "?hello=world", "/example?hello=world&world=hello"]
    html = make_html(make_a_tags(links))
    assert {norm(h) for h in hrefs_from_html(html)} == {norm(l) for l in links}


def test_duplicates_dedupe_by_normalised_form():
    # raw spellings differ; normalised forms collide → one entry each
    links = ["/example", "example", "/example#", "/EXAMPLE"]
    html = make_html(make_a_tags(links))
    got = hrefs_from_html(html)
    # /example == example == /example# after normalisation; /EXAMPLE differs
    assert [norm(h) for h in got] == ["/example", "/EXAMPLE"]
    assert got == ["/example", "/EXAMPLE"]  # first raw spelling kept


def test_non_anchor_hrefs_ignored():
    html = make_html('<link href="/css"/><area href="/area"/>'
                     + make_a_tags(["/real"]))
    assert hrefs_from_html(html) == ["/real"]


def test_broken_html_is_tolerated():
    html = '<a href="/ok"><div><<<>>>< a href="/not-a-tag">'
    assert hrefs_from_html(html) == ["/ok"]


def test_explode_links_df(spark):
    rows = [
        ("http://s/", "http://s/", 200, None,
         make_html(make_a_tags(["/a", "/b", "a"]))),
        ("http://s/r", "http://s/r", 301, "http://s/target",
         make_html(make_a_tags(["/ignored"]))),
    ]
    df = spark.createDataFrame(
        rows, ["url_norm", "url_raw", "status", "redirect_location", "body"])

    plain = explode_links(df.filter(F.col("status") == 200))
    assert [r.href_raw for r in plain.collect()] == ["/a", "/b"]

    redir = explode_links(df, record_redirects=True)
    got = {r.src_url: sorted([r.href_raw]) for r in redir.collect()
           if r.src_url == "http://s/r"}
    assert got == {"http://s/r": ["http://s/target"]}


# --- opt-in fast extractor (CrawlConfig.link_extractor="regex") ----------

_EQUIV_CASES = [
    '<a href="http://x.test/a">a</a><br><a href="/b">b</a>',
    "<html><body><a href='/hello'>hello</a></body></html>",
    '<A HREF="/UP">case</A>',
    '<a class="x" href="/a" href="/b">dup attrs kept</a>',
    '<a href=/unquoted>u</a>',
    '<a href="/with&amp;amp">entity</a>',
    '<a href="">empty</a>',
    '<a>no href</a>',
    '<p><a\nhref="/nl">newline in tag</a></p>',
    '<a href="/a"><a href="/b">nested</a></a>',
    'text with no links at all',
    '<a href="/x" disabled>boolean attr</a>',
    '<a href = "/spaced" >spaces around =</a>',
]


def test_fast_extractor_equivalent_on_wellformed_html():
    from simplecrawler_spark.operators.parse import (
        _hrefs_stdlib, hrefs_fast,
    )

    for html in _EQUIV_CASES:
        assert hrefs_fast(html) == _hrefs_stdlib(html), html


def test_fast_extractor_documented_divergence():
    """The regex scan matches <a> markup inside comments/script text
    that a real parser skips — the reason it is opt-in, never the
    default (operators/parse.py divergence note)."""
    from simplecrawler_spark.operators.parse import (
        _hrefs_stdlib, hrefs_fast,
    )

    comment = '<!-- <a href="/comment">c</a> -->'
    assert _hrefs_stdlib(comment) == []
    assert hrefs_fast(comment) == ["/comment"]


def test_fast_extractor_crawl_visited_set_identical(spark, tmp_path):
    """Full crawl A/B on the fixture graph: link_extractor='regex'
    reaches the identical visited set, depths, and link rows as the
    stdlib default (the fixture corpus is well-formed HTML)."""
    from simplecrawler_spark.config import CrawlConfig
    from simplecrawler_spark.plans.crawl import FrontierCrawler
    from simplecrawler_spark.sources.fetch import TableFetcher
    from simplecrawler_spark.sources.fixtures import (
        crawler_server_rows, site_graph_df,
    )

    base = "http://www.crawler-test-server.com"
    rows = crawler_server_rows(base)
    out = {}
    for ex in ("stdlib", "regex"):
        cfg = CrawlConfig(link_extractor=ex)
        fetcher = TableFetcher(site_graph_df(spark, rows), cfg)
        c = FrontierCrawler(spark, fetcher, cfg,
                            root=str(tmp_path / ex))
        c.crawl(base + "/")
        out[ex] = {(r.url_norm, r.depth, r.status)
                   for r in c.results().collect()}
    assert out["stdlib"] == out["regex"] and len(out["stdlib"]) > 5


# ---------------------------------------------------------------------------
# sitemap extraction
# ---------------------------------------------------------------------------

def _sitemap_rows(spark, body):
    from simplecrawler_spark.operators.parse import (
        extract_sitemap_entries,
    )

    df = spark.createDataFrame([(1, body)], "id long, body string")
    return [(r.loc, r.lastmod) for r in
            extract_sitemap_entries(df, id_cols=("id",))
            .orderBy("loc").collect()]


def test_sitemap_urlset_with_optional_lastmod(spark):
    body = ('<?xml version="1.0"?><urlset>'
            "<url><loc> http://a.test/1 </loc>"
            "<lastmod>2024-01-02</lastmod></url>"
            "<url><loc>http://a.test/2</loc></url></urlset>")
    assert _sitemap_rows(spark, body) == [
        ("http://a.test/1", "2024-01-02"),
        ("http://a.test/2", None)]


def test_sitemap_index_file(spark):
    body = ("<sitemapindex>"
            "<sitemap><loc>http://b.test/s1.xml</loc>"
            "<lastmod>2023-12-31T10:00:00Z</lastmod></sitemap>"
            "<sitemap><loc>http://b.test/s2.xml</loc></sitemap>"
            "</sitemapindex>")
    assert _sitemap_rows(spark, body) == [
        ("http://b.test/s1.xml", "2023-12-31T10:00:00Z"),
        ("http://b.test/s2.xml", None)]


def test_sitemap_empty_and_garbage_bodies(spark):
    assert _sitemap_rows(spark, "<urlset></urlset>") == []
    assert _sitemap_rows(spark, "not xml at all") == []
    assert _sitemap_rows(spark, "") == []


def test_sitemap_lastmod_outside_block_not_paired(spark):
    # lastmod belongs to ITS url block: a loc-less trailing block's
    # lastmod must not leak onto the previous entry
    body = ("<urlset><url><loc>http://c.test/x</loc></url>"
            "<url><lastmod>2020-01-01</lastmod></url></urlset>")
    assert _sitemap_rows(spark, body) == [("http://c.test/x", None)]


# ---------------------------------------------------------------------------
# anchor-text harvesting + aggregation
# ---------------------------------------------------------------------------

def test_anchor_pairs_from_html():
    from simplecrawler_spark.operators.parse import (
        anchor_pairs_from_html,
    )

    html = ('<p><a href="/a">Click <b>here</b> now</a>'
            '<a href="/b"></a>'
            '<a href="/a">Click here  now</a>'
            '<a name="x">not a link</a>'
            '<a href="/c">tail unclosed')
    assert anchor_pairs_from_html(html) == [
        ("/a", "Click here now"),   # nested markup stripped
        ("/b", ""),                 # empty anchor kept
        ("/a", "Click here now"),   # whitespace runs collapsed
        ("/c", "tail unclosed"),    # EOF closes the anchor
    ]
    # entities unescape like HTMLParser; bad HTML yields what parsed
    assert anchor_pairs_from_html('<a href="/x">A &amp; B</a>') == [
        ("/x", "A & B")]
    assert anchor_pairs_from_html("") == []


def test_anchor_pair_start_closes_previous():
    from simplecrawler_spark.operators.parse import (
        anchor_pairs_from_html,
    )

    # a new <a> implicitly closes a dangling one (browsers agree)
    html = '<a href="/1">one<a href="/2">two</a>'
    assert anchor_pairs_from_html(html) == [("/1", "one"),
                                            ("/2", "two")]


def test_anchor_text_agg_modal_and_tiebreak(spark):
    from simplecrawler_spark.operators.parse import anchor_text_agg

    rows = [("/t", "beta"), ("/t", "alpha"), ("/t", "beta"),
            ("/t", "alpha"), ("/t", "gamma"),   # tie beta/alpha -> alpha
            ("/u", "only")]
    df = spark.createDataFrame(rows, "href string, text string")
    got = {r.href: r for r in anchor_text_agg(df).collect()}
    assert (got["/t"].n_refs, got["/t"].n_texts,
            got["/t"].top_text) == (5, 3, "alpha")
    assert (got["/u"].n_refs, got["/u"].n_texts,
            got["/u"].top_text) == (1, 1, "only")


# --- WET-style visible-text extraction --------------------------------------

def test_text_from_html_semantics():
    from simplecrawler_spark.operators.parse import text_from_html

    html = ("<html><head><title>T</title><script>var x = '<p>no</p>';"
            "</script><style>p{color:red}</style></head><body>"
            "<h1>A &amp; B</h1><p>first   para</p>"
            "<p>Visit <a href='/x'>the link</a> now.</p>"
            "<div>block<br>break</div>"
            "<noscript>hidden</noscript></body></html>")
    assert text_from_html(html) == (
        "T\nA & B\nfirst para\nVisit the link now.\nblock\nbreak")


def test_text_from_html_edges():
    from simplecrawler_spark.operators.parse import text_from_html

    # source newlines are whitespace, not block breaks
    assert text_from_html("<p>a\nb</p>") == "a b"
    # empty blocks vanish
    assert text_from_html("<p></p><p>x</p><p>  </p>") == "x"
    # malformed markup is best-effort, never raises (HTMLParser
    # emits an unterminated '<tag' as trailing data — parity)
    assert text_from_html("<p>ok<unclosed") == "ok<unclosed"
    assert text_from_html("") == ""
    # unclosed script swallows its payload only up to EOF (invisible)
    assert text_from_html("<p>seen</p><script>var x=1;") == "seen"


def test_extract_visible_text_udf(spark):
    from simplecrawler_spark.operators.parse import extract_visible_text

    df = spark.createDataFrame(
        [(1, "<body><h2>hi</h2><p>there</p></body>"), (2, None)],
        "id long, body string")
    got = {r.id: r.wet for r in
           df.select("id", extract_visible_text("body").alias("wet"))
           .collect()}
    assert got[1] == "hi\nthere"
    assert got[2] is None


def test_nofollow_extractor():
    """'nofollow' link extractor drops rel=nofollow anchors (token
    match in the space-separated rel list, any case), keeps
    ugc/sponsored-only rels, and otherwise matches the stdlib
    extractor's href semantics."""
    from simplecrawler_spark.operators.parse import _EXTRACTORS

    html = ('<a href="/keep1">a</a>'
            '<a rel="nofollow" href="/drop1">b</a>'
            '<a rel="ugc NOFOLLOW" href="/drop2">c</a>'
            '<a rel="sponsored" href="/keep2">d</a>'
            '<a rel="nofollowish" href="/keep3">e</a>'
            '<a href="/keep4" rel=nofollow>f</a>')
    assert _EXTRACTORS["nofollow"](html) == ["/keep1", "/keep2",
                                             "/keep3"]
    assert _EXTRACTORS["stdlib"](html) == [
        "/keep1", "/drop1", "/drop2", "/keep2", "/keep3", "/keep4"]


def test_meta_robots_expr(spark):
    from simplecrawler_spark.operators.parse import meta_robots_expr

    rows = [
        (0, '<meta name="robots" content="noindex,nofollow">'),
        (1, "<meta content='nofollow' name=robots>"),
        (2, '<meta name=ROBOTS content="NONE">'),
        (3, '<meta name="robots" content=" noindex , archive ">'),
        (4, '<meta name="description" content="noindex">'),
        (5, "no meta at all"),
    ]
    df = spark.createDataFrame(rows, "id long, body string")
    flags = meta_robots_expr("body")
    got = {r.id: r for r in df.select(
        "id", flags["noindex"].alias("ni"),
        flags["nofollow"].alias("nf")).collect()}
    assert got[0].ni and got[0].nf
    assert not got[1].ni and got[1].nf   # content-first order
    assert got[2].ni and got[2].nf      # none = both
    assert got[3].ni and not got[3].nf  # whitespace in list
    assert not got[4].ni and not got[4].nf  # wrong meta name
    assert not got[5].ni and not got[5].nf


def test_main_text_from_html_link_density():
    from simplecrawler_spark.operators.parse import main_text_from_html

    html = ('<html><body>'
            '<div><a href="/a">Home</a> <a href="/b">About</a> '
            '<a href="/c">Contact</a></div>'
            '<p>This is the long article paragraph with real '
            'content in it.</p>'
            '<p>Read more at <a href="/x">this page</a> now '
            'maybe.</p>'
            '<div><a href="/t">Terms</a> | <a href="/p">Privacy</a>'
            '</div>'
            '<p>tiny.</p>'
            '</body></html>')
    got = main_text_from_html(html)
    assert got == ("This is the long article paragraph with real "
                   "content in it.\nRead more at this page now "
                   "maybe.")
    # all-anchor page -> nothing survives
    assert main_text_from_html(
        '<div><a href="/a">All links everywhere here</a></div>') == ""
    # min_chars exemption is a knob
    assert main_text_from_html("<p>tiny.</p>", min_chars=3) == "tiny."
    # nested anchors count once per char; unclosed <a> attributes
    # text to the anchor until EOF
    assert main_text_from_html(
        "<p>prose continues <a>linked tail of the block") == ""


def test_extract_main_text_udf(spark):
    from simplecrawler_spark.operators.parse import extract_main_text

    df = spark.createDataFrame(
        [(1, "<p>a long enough plain prose block here.</p>"),
         (2, None)], "id long, body string")
    got = {r.id: r.m for r in
           df.select("id", extract_main_text("body").alias("m"))
           .collect()}
    assert got[1] == "a long enough plain prose block here."
    assert got[2] is None


def test_html_charset_expr_forms(spark):
    """HTML5 meta-charset (quoted + unquoted + uppercase) and the
    http-equiv Content-Type parameter form all extract; absent
    charset is NULL."""
    from simplecrawler_spark.operators.parse import html_charset_expr

    rows = [
        (0, '<meta charset="utf-8">'),
        (1, "<meta charset=ISO-8859-1 >"),
        (2, '<meta http-equiv="Content-Type" '
            'content="text/html; charset=windows-1252">'),
        (3, "<META CHARSET='UTF-8'>"),
        (4, "<html><head></head></html>"),
    ]
    df = spark.createDataFrame(rows, "i long, body string")
    got = {r.i: r.c for r in df.select(
        "i", html_charset_expr("body").alias("c")).collect()}
    assert got[0] == "utf-8"
    assert got[1] == "iso-8859-1"
    assert got[2] == "windows-1252"
    assert got[3] == "utf-8"
    assert got[4] is None


def test_html_lang_expr_primary_subtag(spark):
    from simplecrawler_spark.operators.parse import html_lang_expr

    rows = [
        (0, '<html lang="en-US"><body>x</body></html>'),
        (1, "<html LANG=DE><body>x</body></html>"),
        (2, "<html><body>x</body></html>"),
        (3, '<html dir="ltr" lang=fr-CA><body>x</body></html>'),
    ]
    df = spark.createDataFrame(rows, "i long, body string")
    got = {r.i: r.g for r in df.select(
        "i", html_lang_expr("body").alias("g")).collect()}
    assert got[0] == "en" and got[1] == "de"
    assert got[2] is None and got[3] == "fr"


def test_rel_canonical_expr_forms(spark):
    """Both attribute orders, optional quoting, the stylesheet
    distractor, and no-link pages; the FIRST canonical wins when a
    page (wrongly) declares two."""
    from simplecrawler_spark.operators.parse import rel_canonical_expr

    rows = [
        (0, '<link rel="canonical" href="http://c/a">'),
        (1, '<link href="http://c/b" rel=canonical>'),
        (2, "<link rel=canonical href='http://c/c'>"),
        (3, '<link rel="stylesheet" href="/x.css">'),
        (4, "<p>no links at all</p>"),
        (5, '<link rel="canonical" href="http://c/first">'
            '<link rel="canonical" href="http://c/second">'),
        (6, '<link rel="stylesheet" href="/x.css">'
            '<link rel="canonical" href="http://c/after">'),
    ]
    df = spark.createDataFrame(rows, "i long, body string")
    got = {r.i: r.c for r in df.select(
        "i", rel_canonical_expr("body").alias("c")).collect()}
    assert got[0] == "http://c/a"
    assert got[1] == "http://c/b"
    assert got[2] == "http://c/c"
    assert got[3] is None and got[4] is None
    assert got[5] == "http://c/first"
    assert got[6] == "http://c/after"
