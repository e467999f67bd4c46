"""The BASELINE.json correctness gate, live: run the ACTUAL reference
crawler (imported from /root/reference) against an in-process Flask
copy of the fixture graph, run the engine against the table copy of the
SAME graph, and assert visited-set equality.

This replays the reference's own end-to-end scenario
(tests/test_crawler.py:237-239) with both engines side by side.
"""

from __future__ import annotations

import sys
import threading
from contextlib import contextmanager

import pytest

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

flask = pytest.importorskip("flask")
werkzeug_serving = pytest.importorskip("werkzeug.serving")
ref_crawler_mod = pytest.importorskip("simple_crawler.crawler")

from simplecrawler_spark.config import CrawlConfig  # noqa: E402
from simplecrawler_spark.plans.crawl import FrontierCrawler  # noqa: E402
from simplecrawler_spark.sources.fetch import TableFetcher  # noqa: E402
from simplecrawler_spark.sources.fixtures import (  # noqa: E402
    crawler_server_rows, make_html_from_links, site_graph_df,
)

HOST, PORT = "127.0.0.1", 19999
BASE = f"http://{HOST}:{PORT}"


@contextmanager
def live_server(app):
    server = werkzeug_serving.make_server(HOST, PORT, app, threaded=True)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield
    finally:
        server.shutdown()
        thread.join()


def build_flask_app():
    """Flask app serving EXACTLY the rows of crawler_server_rows(BASE)
    (which themselves replicate /root/reference/tests/test_crawler.py:40-93)."""
    app = flask.Flask("parity_server")
    for row in crawler_server_rows(BASE):
        path = row["url"][len(BASE):] or "/"

        def make_view(r):
            def view():
                if 300 <= r["status"] < 400:
                    return flask.redirect(r["redirect_location"])
                if r["status"] >= 400:
                    flask.abort(r["status"])
                return (r["body"] or "", 200,
                        {"Content-Type": r["content_type"]})
            return view

        app.add_url_rule(path, endpoint=path, view_func=make_view(row))
    return app


@pytest.mark.parametrize("max_workers", [1, 10])
def test_visited_set_parity(spark, tmp_path, max_workers):
    ref_found = {}

    app = build_flask_app()
    with live_server(app):
        ref = ref_crawler_mod.Crawler(max_workers=max_workers, timeout=1)
        ref_found = ref.crawl(BASE)

    cfg = CrawlConfig()
    fetcher = TableFetcher(site_graph_df(spark, crawler_server_rows(BASE)), cfg)
    engine = FrontierCrawler(spark, fetcher, cfg, root=str(tmp_path / "c"))
    engine.crawl(BASE)

    assert engine.result_urls() == ref_found


def test_visited_set_parity_trim_variants(spark, tmp_path):
    """Query/fragment-variant collapsing, both engines, same graph."""
    host_base = BASE
    links = ["/a?x=1", "/a#frag", "/a", "/b?z=2#f", f"{host_base}/c",
             "https://elsewhere.example.com/x"]
    rows = [
        {"url": host_base + "/", "url_norm": host_base + "/", "status": 200,
         "content_type": "text/html", "body": make_html_from_links(links),
         "redirect_location": None, "ua_required": None, "image_id": None},
    ]
    for p in ["/a", "/b", "/c"]:
        rows.append({"url": host_base + p, "url_norm": host_base + p,
                     "status": 200, "content_type": "text/html", "body": "",
                     "redirect_location": None, "ua_required": None,
                     "image_id": None})

    app = flask.Flask("parity2")
    for row in rows:
        path = row["url"][len(host_base):] or "/"

        def make_view(r):
            def view():
                return (r["body"] or "", 200,
                        {"Content-Type": r["content_type"]})
            return view

        app.add_url_rule(path, endpoint=path, view_func=make_view(row))

    with live_server(app):
        ref = ref_crawler_mod.Crawler(timeout=1)
        ref_found = ref.crawl(host_base)

    cfg = CrawlConfig()
    fetcher = TableFetcher(site_graph_df(spark, rows), cfg)
    engine = FrontierCrawler(spark, fetcher, cfg, root=str(tmp_path / "c2"))
    engine.crawl(host_base)

    assert engine.result_urls() == ref_found


def test_transcript_parity_with_reference_stdout(spark, tmp_path):
    """S5/S7: the engine's rendered crawl_log must reproduce the
    reference's console transcript — the exact multiset of
    CRAWLING:/VISITED:/FOUND: lines the reference prints
    (crawler.py:147,152,155) on the same site graph. ERROR lines are
    compared by url only (the reference embeds requests' exception
    text; the engine records the status code)."""
    import contextlib
    import io

    from simplecrawler_spark.plans.crawl import render_crawl_log

    app = build_flask_app()
    buf = io.StringIO()
    with live_server(app):
        ref = ref_crawler_mod.Crawler(max_workers=1, timeout=1)
        with contextlib.redirect_stdout(buf):
            ref.crawl(BASE)
    ref_lines = [l for l in buf.getvalue().splitlines() if l]
    ref_cvf = sorted(l for l in ref_lines
                     if l.startswith(("CRAWLING:", "VISITED:", "FOUND:")))
    ref_err_urls = sorted(l.rsplit(" ON ", 1)[1] for l in ref_lines
                          if l.startswith("ERROR:"))

    cfg = CrawlConfig(crawl_log=True)
    fetcher = TableFetcher(site_graph_df(spark, crawler_server_rows(BASE)),
                           cfg)
    engine = FrontierCrawler(spark, fetcher, cfg, root=str(tmp_path / "t"))
    engine.crawl(BASE)
    eng_lines = render_crawl_log(engine.crawl_log())
    eng_cvf = sorted(l for l in eng_lines
                     if l.startswith(("CRAWLING:", "VISITED:", "FOUND:")))
    eng_err_urls = sorted(l.rsplit(" ON ", 1)[1] for l in eng_lines
                          if l.startswith("ERROR:"))

    assert eng_cvf == ref_cvf
    assert eng_err_urls == ref_err_urls


@pytest.mark.parametrize("check_head", [False, True])
def test_http_fetcher_robots_obeyed(spark, tmp_path, check_head):
    """Regression (round-2 ADVICE): with check_head=True the HEAD probe
    must not gate robots.txt on the page mime types (text/html) —
    robots.txt is text/plain, and gating it there silently disables
    every disallow rule. The reference fetches robots with
    mime_types=('text/plain',) (crawler.py:186-189)."""
    from simplecrawler_spark.sources.fetch import HttpFetcher

    app = flask.Flask("robots_server")
    app.add_url_rule("/robots.txt", "robots", lambda: (
        "User-agent: *\nDisallow: /blocked\n", 200,
        {"Content-Type": "text/plain"}))
    app.add_url_rule("/", "index", lambda: (
        make_html_from_links(["/blocked", "/ok"]), 200,
        {"Content-Type": "text/html"}))
    app.add_url_rule("/blocked", "blocked", lambda: (
        make_html_from_links(["/"]), 200, {"Content-Type": "text/html"}))
    app.add_url_rule("/ok", "ok", lambda: (
        make_html_from_links(["/"]), 200, {"Content-Type": "text/html"}))

    with live_server(app):
        ref = ref_crawler_mod.Crawler(max_workers=1, timeout=1,
                                      check_head=check_head)
        ref_found = ref.crawl(BASE)

        cfg = CrawlConfig(check_head=check_head)
        engine = FrontierCrawler(spark, HttpFetcher(cfg), cfg,
                                 root=str(tmp_path / f"r{check_head}"))
        engine.crawl(BASE)
        got = engine.result_urls()
    assert f"{BASE}/blocked" not in got
    assert got == ref_found


@pytest.mark.parametrize("check_head", [False, True])
def test_http_fetcher_parity(spark, tmp_path, check_head):
    """S2 real-network fetch (HttpFetcher mapInPandas) and S3/G3
    HEAD-first probing against the live fixture server: visited set
    must equal the reference crawler run with the same check_head."""
    from simplecrawler_spark.sources.fetch import HttpFetcher

    app = build_flask_app()
    with live_server(app):
        ref = ref_crawler_mod.Crawler(max_workers=1, timeout=1,
                                      check_head=check_head)
        ref_found = ref.crawl(BASE)

        cfg = CrawlConfig(check_head=check_head)
        engine = FrontierCrawler(spark, HttpFetcher(cfg), cfg,
                                 root=str(tmp_path / f"h{check_head}"))
        engine.crawl(BASE)
        assert engine.result_urls() == ref_found
