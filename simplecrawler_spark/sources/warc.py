"""WARC-record source: read and write ISO-28500-style web-archive
records as a DataFrame transformation.

Common Crawl — the corpus every open LLM pretraining pipeline starts
from — ships as WARC: concatenated records, each a ``WARC/1.0`` line,
a header block (``WARC-Type``, ``WARC-Target-URI``, ``WARC-Date``,
``Content-Length``), a blank line, then the payload. The reference
crawler stores fetched pages in an in-memory dict
(/root/reference/simple_crawler/crawler.py:240-260); an engine at
100 TB needs the archive format as a first-class source AND sink, so
this module provides both directions as pure JVM column machinery:

* ``warc_record_expr`` — format one (type, uri, date, payload) row as
  a record string; write per-host partitions with it and the output
  IS a (text-mode) WARC shard.
* ``parse_warc_text`` — explode whole-archive strings into one row
  per record, parsing headers with anchored regexes and carving the
  payload with ``Content-Length`` — split + posexplode +
  regexp_extract + substr, no Python, whole-stage codegen.

Sandbox honesty (the documented seam): real WARC is BYTE-oriented
(Content-Length counts octets, payloads may be gzip members, and a
payload could itself contain a line starting ``WARC/1.0``). This
text-mode implementation counts characters and splits on the version
marker — exact for the ASCII fixtures here, and the right DataFrame
shape either way. At production scale the record-boundary scan moves
into the reader (a binaryFile/Hadoop InputFormat splitting on
Content-Length, one task per archive member — each ~1 GB WARC shard
is one parallel unit, no driver involvement); everything from the
exploded-record rows down is THIS plan unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["warc_record_expr", "parse_warc_text", "wat_record_expr"]

_MARKER = "WARC/1.0\n"

# header block = everything before the first blank line; body = after
_HDRS_RE = r"(?s)^(.*?)\n\n"
_BODY_RE = r"(?s)^.*?\n\n(.*)$"


def warc_record_expr(warc_type: Column, uri: Column, date: Column,
                     payload: Column) -> Column:
    """One formatted WARC record (text mode — see module docstring):
    version line, four headers, blank line, payload, blank line.
    Content-Length is computed from the payload column. Pure concat."""
    return F.concat(
        F.lit(_MARKER),
        F.lit("WARC-Type: "), warc_type, F.lit("\n"),
        F.lit("WARC-Target-URI: "), uri, F.lit("\n"),
        F.lit("WARC-Date: "), date, F.lit("\n"),
        F.lit("Content-Length: "), F.length(payload).cast("string"),
        F.lit("\n\n"),
        payload, F.lit("\n\n"))


def parse_warc_text(archives: DataFrame, content_col: str = "content",
                    file_col: str = "file_id") -> DataFrame:
    """Explode whole-archive strings into records: returns
    (file_col, record_no, warc_type, url, date, content_length,
    payload) with record_no the 0-based position within its archive.

    Scale shape: one narrow explode per archive row (an archive shard
    is the natural parallel unit — Common Crawl ships ~1 GB each, so
    a 100 TB crawl is ~10^5 independent tasks), then per-record
    regex/substr in codegen. Records missing a parseable header
    block come back with NULL fields rather than failing the stage
    (poison tolerance; filter on ``warc_type IS NOT NULL``).
    """
    recs = F.split(F.col(content_col), r"WARC/1\.0\r?\n")
    exploded = (archives
                .select(F.col(file_col),
                        F.posexplode(recs).alias("_pos", "_rec"))
                .where(F.col("_rec") != ""))
    hdrs = F.regexp_extract(F.col("_rec"), _HDRS_RE, 1)
    body = F.regexp_extract(F.col("_rec"), _BODY_RE, 1)
    clen = F.nullif(
        F.regexp_extract(hdrs, r"(?im)^Content-Length:\s*(\d+)\s*$", 1),
        F.lit("")).cast("long")
    hdr = lambda name: F.nullif(  # noqa: E731
        F.regexp_extract(hdrs, rf"(?im)^{name}:\s*(\S+)\s*$", 1),
        F.lit(""))
    return exploded.select(
        F.col(file_col),
        # the split's leading chunk (before the first marker) is
        # dropped above, so record 0 is _pos 1
        (F.col("_pos") - 1).cast("long").alias("record_no"),
        hdr("WARC-Type").alias("warc_type"),
        hdr("WARC-Target-URI").alias("url"),
        hdr("WARC-Date").alias("date"),
        clen.alias("content_length"),
        F.when(clen.isNotNull(), F.substr(body, F.lit(1), clen))
        .alias("payload"),
    )


def wat_record_expr(url: Column, status: Column, mime: Column,
                    links: Column) -> Column:
    """Common-Crawl-WAT-style metadata record for one fetched page:
    the queryable ENVELOPE of the archive (WARC carries payloads;
    WAT carries per-record metadata + the extracted outlinks, and is
    what link-graph / seed-mining jobs read so they never touch
    payload bytes). One compact JSON string per page —
    {"url":…,"status":…,"mime":…,"n_links":…,"links":[…]} — via
    pure-JVM to_json; Spark's and DuckDB's compact JSON renderings
    are byte-identical for this shape, so q_wat compares md5s of the
    records themselves."""
    return F.to_json(F.struct(
        url.alias("url"),
        status.cast("int").alias("status"),
        mime.alias("mime"),
        F.size(links).cast("int").alias("n_links"),
        links.alias("links")))
