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
