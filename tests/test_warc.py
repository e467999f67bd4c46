"""WARC source (sources/warc.py): format → parse roundtrip, header
parsing, Content-Length payload carve, poison tolerance, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from simplecrawler_spark.sources.warc import (
    parse_warc_text, warc_record_expr,
)


def _archive(docs):
    rec = warc_record_expr(F.lit("response"), F.col("url"),
                           F.lit("2026-01-01T00:00:00Z"), F.col("text"))
    return (docs.select("file_id", "doc_id", rec.alias("r"))
            .groupBy("file_id")
            .agg(F.array_join(F.transform(F.array_sort(
                F.collect_list(F.struct("doc_id", "r"))),
                lambda s: s.r), "").alias("content")))


def test_warc_roundtrip(spark):
    docs = spark.createDataFrame(
        [(0, "f1", "http://a/0", "hello world"),
         (1, "f1", "http://a/1", "multi\nline\npayload"),
         (2, "f2", "http://b/2", "x")],
        "doc_id long, file_id string, url string, text string")
    got = {(r.file_id, r.record_no): r
           for r in parse_warc_text(_archive(docs)).collect()}
    assert len(got) == 3
    r = got[("f1", 1)]
    assert r.warc_type == "response" and r.url == "http://a/1"
    assert r.date == "2026-01-01T00:00:00Z"
    assert r.content_length == 18
    assert r.payload == "multi\nline\npayload"  # newlines survive
    assert got[("f2", 0)].payload == "x"


def test_warc_payload_with_headerlike_lines(spark):
    """Content-Length carves the payload, so header-shaped TEXT inside
    the payload is data, not headers — and the record's own headers
    are only read from the block before the first blank line."""
    tricky = "Content-Length: 999\nWARC-Type: fake\nreal body"
    docs = spark.createDataFrame(
        [(0, "f", "http://a/0", tricky)],
        "doc_id long, file_id string, url string, text string")
    r = parse_warc_text(_archive(docs)).collect()[0]
    assert r.content_length == len(tricky)
    assert r.payload == tricky
    assert r.warc_type == "response"  # not 'fake'


def test_warc_malformed_record_yields_nulls(spark):
    """A chunk with no parseable headers comes back with NULL fields
    (poison tolerance at 10^5-archive scale) instead of failing."""
    arch = spark.createDataFrame(
        [("f", "WARC/1.0\ngarbage without blank line")],
        "file_id string, content string")
    rows = parse_warc_text(arch).collect()
    assert len(rows) == 1
    assert rows[0].warc_type is None and rows[0].payload is None


def test_warc_parse_plan_is_narrow_jvm(spark):
    """Parsing is split+posexplode+regex+substr — no shuffle beyond
    the caller's own layout, no Python."""
    arch = spark.createDataFrame(
        [("f", "WARC/1.0\nWARC-Type: response\n\nx\n\n")],
        "file_id string, content string")
    plan = (parse_warc_text(arch)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_wat_record_expr(spark):
    """The WAT envelope is a compact JSON string with pinned field
    order and array rendering; n_links derives from the links
    column."""
    from simplecrawler_spark.sources.warc import wat_record_expr

    df = spark.createDataFrame(
        [("http://a/b", 200, "text/html", ["http://c/", "http://d/"])],
        "url string, status int, mime string, links array<string>")
    rec = df.select(wat_record_expr(
        F.col("url"), F.col("status"), F.col("mime"),
        F.col("links")).alias("j")).collect()[0].j
    assert rec == ('{"url":"http://a/b","status":200,'
                   '"mime":"text/html","n_links":2,'
                   '"links":["http://c/","http://d/"]}')
