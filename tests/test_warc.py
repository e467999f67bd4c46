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


def _byte_archive(docs):
    from simplecrawler_spark.sources.warc import warc_record_bytes_expr

    rec = warc_record_bytes_expr(
        F.lit("response"), F.col("url"),
        F.lit("2026-01-01T00:00:00Z"), F.encode(F.col("text"), "UTF-8"))
    return (docs.select("file_id", "doc_id", rec.alias("r"))
            .groupBy("file_id")
            .agg(F.aggregate(F.transform(F.array_sort(
                F.collect_list(F.struct("doc_id", "r"))),
                lambda s: s.r), F.lit(b""),
                lambda acc, x: F.concat(acc, x)).alias("content")))


def test_warc_bytes_roundtrip_marker_in_payload(spark):
    """Byte mode carves by Content-Length octets, so a payload that
    CONTAINS a 'WARC/1.0' version line is data, not a record boundary
    — the case text-mode marker splitting cannot handle."""
    from simplecrawler_spark.sources.warc import parse_warc_bytes

    tricky = "before\nWARC/1.0\nWARC-Type: fake\n\nafter"
    docs = spark.createDataFrame(
        [(0, "f1", "http://a/0", "hello"),
         (1, "f1", "http://a/1", tricky),
         (2, "f2", "http://b/2", "x")],
        "doc_id long, file_id string, url string, text string")
    got = {(r.file_id, r.record_no): r
           for r in parse_warc_bytes(_byte_archive(docs)).collect()}
    assert len(got) == 3
    r = got[("f1", 1)]
    assert r.warc_type == "response" and r.url == "http://a/1"
    assert r.content_length == len(tricky.encode())
    assert bytes(r.payload).decode() == tricky
    assert bytes(got[("f2", 0)].payload).decode() == "x"


def test_warc_bytes_content_length_counts_octets(spark):
    """Multi-byte UTF-8: Content-Length is octets, not characters —
    the byte reader slices exactly the encoded length and the payload
    survives byte-exact."""
    from simplecrawler_spark.sources.warc import parse_warc_bytes

    text = "café — № 1"          # 10 chars, 15 octets
    docs = spark.createDataFrame(
        [(0, "f", "http://a/0", text),
         (1, "f", "http://a/1", "next")],
        "doc_id long, file_id string, url string, text string")
    rows = {r.record_no: r
            for r in parse_warc_bytes(_byte_archive(docs)).collect()}
    assert rows[0].content_length == len(text.encode("utf-8")) == 15
    assert bytes(rows[0].payload).decode("utf-8") == text
    assert bytes(rows[1].payload).decode() == "next"  # resynced cleanly


def test_warc_bytes_gzip_members(spark):
    """Common-Crawl layout: each record its own gzip member,
    concatenated. The reader inflates member-at-a-time and carves the
    joined stream."""
    import gzip

    from simplecrawler_spark.sources.warc import parse_warc_bytes

    def rec(url, body):
        b = body.encode()
        return (b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"WARC-Target-URI: " + url.encode() + b"\r\n"
                b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
                b"Content-Length: " + str(len(b)).encode() +
                b"\r\n\r\n" + b + b"\r\n\r\n")
    blob = (gzip.compress(rec("http://a/0", "first body")) +
            gzip.compress(rec("http://a/1", "second")))
    arch = spark.createDataFrame([("f", bytearray(blob))],
                                 "file_id string, content binary")
    rows = {r.record_no: r for r in parse_warc_bytes(arch).collect()}
    assert len(rows) == 2
    assert rows[0].url == "http://a/0"
    assert bytes(rows[0].payload) == b"first body"
    assert bytes(rows[1].payload) == b"second"


def test_warc_bytes_malformed_and_truncated(spark):
    """Poison tolerance: garbage before a record yields one NULL-field
    row then resyncs at the next marker; a truncated tail reports the
    declared length with a NULL payload."""
    from simplecrawler_spark.sources.warc import parse_warc_bytes

    blob = (b"not a warc header\n\n"
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: http://a/0\r\n"
            b"Content-Length: 4\r\n\r\ngood\r\n\r\n"
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: http://a/1\r\n"
            b"Content-Length: 100\r\n\r\nshort")
    arch = spark.createDataFrame([("f", bytearray(blob))],
                                 "file_id string, content binary")
    rows = sorted(parse_warc_bytes(arch).collect(),
                  key=lambda r: r.record_no)
    assert len(rows) == 3
    assert rows[0].warc_type is None and rows[0].payload is None
    assert bytes(rows[1].payload) == b"good"
    assert rows[2].url == "http://a/1"
    assert rows[2].content_length == 100 and rows[2].payload is None


def test_warc_bytes_matches_text_mode_on_ascii(spark):
    """On ASCII, marker-free payloads the two readers agree row for
    row (text mode is the codegen fast path, byte mode the production
    path)."""
    from simplecrawler_spark.sources.warc import parse_warc_bytes

    docs = spark.createDataFrame(
        [(0, "f1", "http://a/0", "hello world"),
         (1, "f1", "http://a/1", "multi\nline\npayload"),
         (2, "f2", "http://b/2", "x")],
        "doc_id long, file_id string, url string, text string")
    t = {(r.file_id, r.record_no):
         (r.warc_type, r.url, r.date, r.content_length, r.payload)
         for r in parse_warc_text(_archive(docs)).collect()}
    b = {(r.file_id, r.record_no):
         (r.warc_type, r.url, r.date, r.content_length,
          bytes(r.payload).decode())
         for r in parse_warc_bytes(_byte_archive(docs)).collect()}
    # text mode counts characters with LF endings; byte mode octets
    # with CRLF framing — identical for this fixture
    assert t == b


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


def test_warc_bytes_garbage_without_blank_line_keeps_next_record(spark):
    """Garbage that never terminates with a blank line swallows the
    following record's headers into its chunk — the resync must
    search from just past the garbage start, not from the chunk's
    first blank line, or that record is lost (round-4 ADVICE)."""
    from simplecrawler_spark.sources.warc import parse_warc_bytes

    # garbage has NO blank line before the marker; the record's OWN
    # header/payload separator is the first blank line in the buffer
    blob = (b"garbage prefix with no blank line\n"
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: http://a/0\r\n"
            b"Content-Length: 4\r\n\r\ngood\r\n\r\n")
    arch = spark.createDataFrame([("f", bytearray(blob))],
                                 "file_id string, content binary")
    rows = sorted(parse_warc_bytes(arch).collect(),
                  key=lambda r: r.record_no)
    assert len(rows) == 2
    assert rows[0].warc_type is None          # the garbage row
    assert rows[1].url == "http://a/0"        # the record SURVIVES
    assert bytes(rows[1].payload) == b"good"
