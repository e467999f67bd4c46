"""S5 per-URL crawl-log sink + CLI transcript parity (round-2 verdict
item 3): the engine's crawl_log table rendered as the reference's
console lines (crawler.py:147,152,155,174 prints), with the
order-insensitive containment assertions of the reference's own CLI
test (/root/reference/tests/test_cli.py:79-143).
"""

from __future__ import annotations

from simplecrawler_spark.config import CrawlConfig
from simplecrawler_spark.plans.crawl import FrontierCrawler, render_crawl_log
from simplecrawler_spark.sources.fetch import TableFetcher
from simplecrawler_spark.sources.fixtures import (
    _row, make_html_from_links, site_graph_df,
)

BASE = "http://t.test"


def _cli_graph_rows():
    """The reference CLI test's site (tests/test_cli.py:83-105):
    /, /hello, /world, /hello/world cross-linked, /error 500s,
    /hello.pdf is wrong-MIME."""
    links = ["/", "/hello", "/world", "/hello/world", "/error",
             "/hello.pdf"]
    sub = ["/", "/hello", "/world", "/hello/world"]
    return [
        _row(BASE + "/", body=make_html_from_links(links)),
        _row(BASE + "/hello", body=make_html_from_links(sub)),
        _row(BASE + "/world", body=make_html_from_links(sub)),
        _row(BASE + "/hello/world", body=make_html_from_links(sub)),
        _row(BASE + "/error", status=500, body=""),
        _row(BASE + "/hello.pdf", content_type="text/pdf", body=""),
    ]


def _crawl_lines(spark, tmp_path, rows, cfg=None, seed=BASE):
    cfg = cfg or CrawlConfig(crawl_log=True)
    assert cfg.crawl_log
    crawler = FrontierCrawler(spark, TableFetcher(site_graph_df(spark, rows),
                                                  cfg),
                              cfg, root=str(tmp_path / "log"))
    crawler.crawl(seed)
    return render_crawl_log(crawler.crawl_log())


def test_transcript_mirrors_reference_cli_assertions(spark, tmp_path):
    lines = _crawl_lines(spark, tmp_path, _cli_graph_rows())

    for p in ["/", "/world", "/hello/world", "/hello"]:
        assert f"CRAWLING: {BASE}{p}" in lines
        assert f"VISITED: {BASE}{p}" in lines

    for href in ["/", "/hello", "/world", "/hello/world", "/error",
                 "/hello.pdf"]:
        assert f"FOUND: {href} ON {BASE}/" in lines
    for src in ["/hello", "/world", "/hello/world"]:
        for href in ["/", "/hello", "/world", "/hello/world"]:
            assert f"FOUND: {href} ON {BASE}{src}" in lines

    # 4xx/5xx: fetched, ERROR, never done (crawler.py:168-174)
    assert f"CRAWLING: {BASE}/error" in lines
    assert f"ERROR: 500 ON {BASE}/error" in lines
    assert f"VISITED: {BASE}/error" not in lines
    # wrong-MIME: VISITED (done) but nothing FOUND on it (:176-180)
    assert f"VISITED: {BASE}/hello.pdf" in lines
    assert not any(l.endswith(f"ON {BASE}/hello.pdf") for l in lines)


def test_transcript_robots_blocked_line(spark, tmp_path):
    rows = [
        _row(BASE + "/robots.txt", content_type="text/plain",
             body="User-agent: *\nDisallow: /blocked\n"),
        _row(BASE + "/", body=make_html_from_links(["/blocked", "/ok"])),
        _row(BASE + "/blocked", body=""),
        _row(BASE + "/ok", body=""),
    ]
    lines = _crawl_lines(spark, tmp_path, rows)
    assert f"PySimpleCrawler can't crawl {BASE}/blocked" in lines
    assert f"CRAWLING: {BASE}/blocked" not in lines
    assert f"VISITED: {BASE}/ok" in lines


def test_render_log_round_slice_and_limit(spark, tmp_path):
    """Round-2 verdict item 5: the non-collect transcript path —
    render only round k's partition of a multi-round crawl, and cap
    the collected rows Spark-side."""
    cfg = CrawlConfig(crawl_log=True)
    crawler = FrontierCrawler(
        spark, TableFetcher(site_graph_df(spark, _cli_graph_rows()), cfg),
        cfg, root=str(tmp_path / "sliced"))
    crawler.crawl(BASE)
    full = render_crawl_log(crawler.crawl_log())

    rounds = sorted({r.round for r in
                     crawler.crawl_log().select("round").distinct()
                     .collect()})
    assert len(rounds) >= 2  # multi-round crawl

    k = rounds[1]
    sliced = crawler.render_log(rounds=k)
    expected = render_crawl_log(
        crawler.crawl_log().where(f"round = {k}"))
    assert sliced == expected
    assert sliced and set(sliced) < set(full)

    # limit returns the first N lines of the ordered transcript
    capped = crawler.render_log(limit=5)
    assert capped == full[:5]
    # per-round + limit compose
    assert crawler.render_log(rounds=k, limit=3) == expected[:3]
    # whole-transcript render via slices covers every round
    assert crawler.render_log(rounds=rounds) == full


def test_crawl_log_off_by_default(spark, tmp_path):
    cfg = CrawlConfig()
    crawler = FrontierCrawler(
        spark, TableFetcher(site_graph_df(spark, _cli_graph_rows()), cfg),
        cfg, root=str(tmp_path / "nolog"))
    crawler.crawl(BASE)
    assert crawler.crawl_log().count() == 0
    assert len(crawler.result_urls()) == 5
