"""Crawl-trap detection (operators/traps.py url_trap_flags): one test
per rule at its boundary, plus clean-URL and composite checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from simplecrawler_spark.operators.traps import url_trap_flags


def _flags(spark, url, **kw):
    df = spark.createDataFrame([(url,)], "url string")
    return df.withColumns(url_trap_flags(F.col("url"), **kw)).first()


def test_clean_url_no_flags(spark):
    r = _flags(spark, "http://example.com/a/b?x=1&y=2")
    assert not r.is_trap
    assert r.depth == 2 and r.n_params == 2
    assert not any([r.trap_deep, r.trap_repeat, r.trap_params,
                    r.trap_session, r.trap_calendar, r.trap_long])


def test_deep_boundary(spark):
    base = "http://h.test/" + "/".join(f"s{i}" for i in range(12))
    assert not _flags(spark, base).trap_deep            # == max_depth
    deeper = base + "/s12"
    assert _flags(spark, deeper).trap_deep              # max_depth + 1
    assert not _flags(spark, deeper, max_depth=13).trap_deep


def test_repeat_boundary(spark):
    assert not _flags(spark, "http://h.test/x/y/x").trap_repeat  # 2x
    r = _flags(spark, "http://h.test/x/y/x/y/x")                 # 3x
    assert r.trap_repeat and r.is_trap
    assert _flags(spark, "http://h.test/x/y/x",
                  repeat_k=2).trap_repeat


def test_params_boundary(spark):
    q10 = "&".join(f"p{i}={i}" for i in range(10))
    assert not _flags(spark, f"http://h.test/p?{q10}").trap_params
    q11 = q10 + "&p10b=1"
    assert _flags(spark, f"http://h.test/p?{q11}").trap_params
    # empty query is zero params, not one
    assert _flags(spark, "http://h.test/p").n_params == 0


def test_session_param_names(spark):
    for name in ("phpsessid", "jsessionid", "sid", "sessionid"):
        assert _flags(spark,
                      f"http://h.test/p?{name}=x").trap_session, name
    # must match the NAME at a param boundary, not a value/substring
    assert not _flags(spark, "http://h.test/p?classid=9").trap_session
    assert not _flags(spark, "http://h.test/p?a=sid").trap_session
    # second position (after &) matches too
    assert _flags(spark, "http://h.test/p?a=1&sid=2").trap_session


def test_calendar_needs_two_date_segments(spark):
    assert not _flags(spark, "http://h.test/2024/news").trap_calendar
    assert _flags(spark, "http://h.test/2024/05/2023").trap_calendar
    assert _flags(spark,
                  "http://h.test/2024-05-01/2024-05-02").trap_calendar
    # 3-digit or 5-digit segments are not dates
    assert not _flags(spark, "http://h.test/204/20245").trap_calendar


def test_long_url(spark):
    assert _flags(spark, "http://h.test/" + "x" * 2100).trap_long
    assert not _flags(spark, "http://h.test/" + "x" * 100).trap_long
    assert _flags(spark, "http://h.test/" + "x" * 100,
                  max_len=50).trap_long


def test_fragment_and_query_excluded_from_path(spark):
    # path extraction must stop at ? and #: the repeated 'x' in the
    # query/fragment must not count as path segments
    r = _flags(spark, "http://h.test/a/b?x=x/x/x#x/x/x")
    assert r.depth == 2 and not r.trap_repeat


def test_trap_filter_gates_the_frontier(spark, tmp_path):
    """CrawlConfig.trap_filter: discovered hrefs that trip a trap rule
    never enter the frontier (not fetched, not in seen); with the
    default (off) the same links are crawled. Clean links are
    unaffected either way."""
    from simplecrawler_spark.config import CrawlConfig
    from simplecrawler_spark.plans.crawl import FrontierCrawler
    from simplecrawler_spark.sources.fetch import TableFetcher
    from simplecrawler_spark.sources.fixtures import (
        _row, make_html_from_links, site_graph_df,
    )

    seed = "http://t.test/"
    ok = "http://t.test/ok"
    trap_sess = "http://t.test/p?phpsessid=abc"
    trap_cal = "http://t.test/2024/05/2023/06"
    rows = [
        _row(seed, body=make_html_from_links([ok, trap_sess, trap_cal])),
        _row(ok, body=""),
        _row(trap_sess, body=""),
        _row(trap_cal, body=""),
    ]

    def visited(trap_filter):
        cfg = CrawlConfig(trap_filter=trap_filter, trim_query=False)
        c = FrontierCrawler(
            spark, TableFetcher(site_graph_df(spark, rows), cfg), cfg,
            root=str(tmp_path / f"tf-{trap_filter}"))
        c.crawl(seed)
        return {r.url_norm
                for r in c.results().select("url_norm").collect()}

    on = visited(True)
    assert ok in on
    assert trap_sess not in on and trap_cal not in on

    off = visited(False)
    assert {ok, trap_sess, trap_cal} <= off


def test_host_suffixes_expr(spark):
    from simplecrawler_spark.operators.traps import host_suffixes_expr

    rows = [("http://a.B.Example.com:8080/x?y#z",),
            ("https://user:pw@deep.ads.net/",),
            ("http://localhost/p",),
            ("not a url",)]
    df = spark.createDataFrame(rows, "url string")
    got = [r.s for r in
           df.select(host_suffixes_expr(F.col("url")).alias("s"))
           .collect()]
    assert got[0] == ["a.b.example.com", "b.example.com", "example.com"]
    assert got[1] == ["deep.ads.net", "ads.net"]
    assert got[2] == ["localhost"]
    assert got[3] == []


def test_blocklist_gate_subdomain_and_longest_match(spark):
    from simplecrawler_spark.operators.traps import blocklist_gate

    urls = spark.createDataFrame(
        [(1, "http://x.ads.example.com/p"),   # both entries match
         (2, "http://www.example.com/q"),     # parent only
         (3, "http://example.org/r"),         # clean
         (4, "http://ads.example.com/s"),     # exact entry
         (5, "http://notexample.com/t")],     # suffix is LABEL-wise
        "id long, url string")
    bl = spark.createDataFrame(
        [("example.com",), ("ads.example.com",)], "domain string")
    got = {r.id: r for r in blocklist_gate(urls, bl).collect()}
    assert got[1].blocked_domain == "ads.example.com"  # most specific
    assert got[2].blocked_domain == "example.com"
    assert got[3].blocked_domain is None and got[3].keep
    assert got[4].blocked_domain == "ads.example.com"
    # 'notexample.com' must NOT match 'example.com' (no substring join)
    assert got[5].keep


def test_blocklist_gate_broadcasts_small_list(spark):
    """With broadcast_list=True (the curated-list case) the blocklist
    side must hash-join broadcast — no shuffle of the URL rows for
    the candidate join, and never a cartesian/LIKE scan."""
    from simplecrawler_spark.operators.traps import blocklist_gate

    urls = spark.createDataFrame(
        [(1, "http://a.example.com/p")], "id long, url string")
    bl = spark.createDataFrame([("example.com",)], "domain string")
    plan = (blocklist_gate(urls, bl)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_url_quality_features(spark):
    """Every feature hand-checked on contrasting shapes; bare root
    path has depth 0; tld is the last host label (naive)."""
    from simplecrawler_spark.operators.traps import url_quality_features

    rows = [
        (0, "http://www.blog.site.com/post/2024/17?id=3&ref=rss"),
        (1, "https://site9.co.uk/"),
        (2, "http://u:p@shop.example.org:8080/a/b/c"),
    ]
    df = spark.createDataFrame(rows, "i long, url string")
    feats = url_quality_features(F.col("url"))
    got = {r.i: r for r in df.select(
        "i", *[v.alias(k) for k, v in feats.items()]).collect()}
    r = got[0]
    assert r.host == "www.blog.site.com" and r.tld == "com"
    assert r.n_subdomains == 2 and r.path_depth == 3
    assert r.n_params == 2 and r.n_digits == 4 + 2 + 1  # 2024,17,3
    assert r.path_len == len("/post/2024/17")
    r = got[1]
    assert r.host == "site9.co.uk" and r.tld == "uk"
    assert r.n_subdomains == 1 and r.path_depth == 0
    assert r.n_params == 0 and r.path_len == 1
    r = got[2]
    assert r.host == "shop.example.org"  # userinfo + port stripped
    assert r.path_depth == 3 and r.n_digits == 4


def test_url_quality_features_plan_narrow(spark):
    from simplecrawler_spark.operators.traps import url_quality_features

    df = spark.createDataFrame([(0, "http://a.com/x")],
                               "i long, url string")
    feats = url_quality_features(F.col("url"))
    plan = (df.select(*[v.alias(k) for k, v in feats.items()])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_url_quality_features_malformed_urls_null_not_fail(spark):
    """Poison tolerance under ANSI mode: a schemeless string or an
    empty host yields NULL host/tld and zero counts — never a stage
    failure (element_at(-1) on an empty label array would throw)."""
    from simplecrawler_spark.operators.traps import url_quality_features

    df = spark.createDataFrame(
        [(0, "not a url at all"), (1, "http:///nohost/a/b")],
        "i long, url string")
    feats = url_quality_features(F.col("url"))
    got = {r.i: r for r in df.select(
        "i", *[v.alias(k) for k, v in feats.items()]).collect()}
    assert got[0].host is None and got[0].tld is None
    assert got[1].host is None and got[1].path_depth == 3
