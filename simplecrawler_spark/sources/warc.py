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

Text mode vs byte mode: real WARC is BYTE-oriented (Content-Length
counts octets, payloads may be gzip members, and a payload could
itself contain a line starting ``WARC/1.0``). ``parse_warc_text``
counts characters and splits on the version marker — exact for ASCII
fixtures and fully codegen. ``parse_warc_bytes`` is the production
reader: it takes BINARY archive content (e.g.
``spark.read.format("binaryFile")``), inflates per-record gzip
members, and carves each record by its Content-Length octet count —
so multi-byte UTF-8, marker-bearing payloads, and compressed members
all parse correctly. Archives are the parallel unit either way (Common
Crawl ships ~1 GB shards, so 100 TB is ~10^5 independent tasks); the
byte carve is a sequential scan per archive inside one Arrow-batched
``mapInPandas`` stage, and everything from the exploded-record rows
down is the same plan as text mode.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["warc_record_expr", "parse_warc_text", "wat_record_expr",
           "warc_record_bytes_expr", "parse_warc_bytes"]

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


def warc_record_bytes_expr(warc_type: Column, uri: Column, date: Column,
                           payload: Column) -> Column:
    """One BYTE-mode WARC record as a binary column: CRLF line
    endings, Content-Length = octet count of the binary payload —
    the on-disk grammar parse_warc_bytes reads back. ``payload`` must
    be binary (``F.encode(text, 'UTF-8')`` for text payloads). Pure
    binary concat, whole-stage codegen."""
    enc = lambda c: F.encode(c, "UTF-8")  # noqa: E731
    return F.concat(
        F.lit(b"WARC/1.0\r\n"),
        F.lit(b"WARC-Type: "), enc(warc_type), F.lit(b"\r\n"),
        F.lit(b"WARC-Target-URI: "), enc(uri), F.lit(b"\r\n"),
        F.lit(b"WARC-Date: "), enc(date), F.lit(b"\r\n"),
        F.lit(b"Content-Length: "),
        enc(F.octet_length(payload).cast("string")),
        F.lit(b"\r\n\r\n"),
        payload, F.lit(b"\r\n\r\n"))


_GZ_MAGIC = b"\x1f\x8b"
_WARC_BYTES_SCHEMA = (
    "file_id string, record_no long, warc_type string, url string, "
    "date string, content_length long, payload binary")


def _gunzip_members(buf: bytes) -> bytes:
    """Inflate a concatenation of gzip members (Common Crawl gzips
    each record as its own member) into one byte stream. Non-gzip
    input passes through untouched; a corrupt member ends the stream
    at the last good byte (poison tolerance — the carve below then
    reports what parsed)."""
    if not buf.startswith(_GZ_MAGIC):
        return buf
    out: list[bytes] = []
    while buf.startswith(_GZ_MAGIC):
        d = zlib.decompressobj(31)
        try:
            out.append(d.decompress(buf))
            out.append(d.flush())
        except zlib.error:
            break
        if d.unused_data == buf:  # zero progress: corrupt header
            break
        buf = d.unused_data
    return b"".join(out)


def _carve_records(buf: bytes) -> list[tuple]:
    """Sequentially carve (warc_type, url, date, content_length,
    payload) tuples out of one decompressed archive. Byte semantics
    throughout: the header block ends at the first blank line (CRLF
    or bare LF), Content-Length counts octets, and the payload is
    sliced by length — never by marker search — so payloads may
    contain ``WARC/1.0`` lines, header-shaped text, or arbitrary
    binary. Unparseable chunks yield a NULL-field tuple and the scan
    resyncs at the next version marker."""
    rows: list[tuple] = []
    pos, n = 0, len(buf)
    while pos < n:
        while pos < n and buf[pos] in (10, 13):
            pos += 1
        if pos >= n:
            break
        ends = [(e, s) for e, s in ((buf.find(b"\r\n\r\n", pos), 4),
                                    (buf.find(b"\n\n", pos), 2))
                if e != -1]
        if not ends:
            rows.append((None, None, None, None, None))
            break
        end, sep = min(ends)
        head = buf[pos:end]
        if not head.startswith(b"WARC/"):
            rows.append((None, None, None, None, None))
            # resync from pos+1, NOT from the blank line at `end`:
            # garbage with no blank line of its own swallows the next
            # record's headers into this chunk, so a valid marker can
            # sit anywhere in (pos, end) and searching from `end`
            # would silently drop that record
            nxt = buf.find(b"WARC/1.0", pos + 1)
            if nxt == -1:
                break
            pos = nxt
            continue
        hdrs: dict[bytes, bytes] = {}
        for line in head.split(b"\n")[1:]:
            key, _, val = line.rstrip(b"\r").partition(b":")
            if val:
                hdrs[key.strip().lower()] = val.strip()
        dec = lambda b: (b.decode("utf-8", "replace")  # noqa: E731
                         if b is not None else None)
        wtype = dec(hdrs.get(b"warc-type"))
        url = dec(hdrs.get(b"warc-target-uri"))
        date = dec(hdrs.get(b"warc-date"))
        clen = hdrs.get(b"content-length", b"")
        if not re.fullmatch(rb"\d+", clen):
            rows.append((wtype, url, date, None, None))
            nxt = buf.find(b"WARC/1.0", end)
            pos = nxt if nxt != -1 else n
            continue
        length = int(clen)
        start = end + sep
        payload = buf[start:start + length]
        if len(payload) < length:  # truncated archive tail
            rows.append((wtype, url, date, length, None))
            break
        rows.append((wtype, url, date, length, bytes(payload)))
        pos = start + length
    return rows


def parse_warc_bytes(archives: DataFrame, content_col: str = "content",
                     file_col: str = "file_id",
                     batch_records: int = 4096) -> DataFrame:
    """Byte-mode WARC reader (the production path — see module
    docstring): explode BINARY whole-archive content into one row per
    record with the same schema as parse_warc_text except ``payload``
    stays binary (decode belongs to the consumer — an HTML payload is
    text, an image payload is not).

    Scale shape: one archive row per task (the archive shard is the
    parallel unit), gzip-member inflate + Content-Length carve inside
    a single Arrow-batched mapInPandas stage, output flushed every
    ``batch_records`` records so a many-record archive never
    materialises as one Arrow batch."""
    import pandas as pd

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["file_id", "record_no", "warc_type", "url", "date",
                "content_length", "payload"]
        buf_rows: list[tuple] = []
        for pdf in batches:
            for fid, content in zip(pdf[file_col], pdf[content_col]):
                if content is None:
                    continue
                recs = _carve_records(_gunzip_members(bytes(content)))
                buf_rows.extend((fid, i, *r) for i, r in enumerate(recs))
                while len(buf_rows) >= batch_records:
                    chunk, buf_rows = (buf_rows[:batch_records],
                                       buf_rows[batch_records:])
                    yield pd.DataFrame(chunk, columns=cols)
        if buf_rows:
            yield pd.DataFrame(buf_rows, columns=cols)

    return (archives.select(F.col(file_col).alias("file_id"),
                            F.col(content_col).alias(content_col))
            .mapInPandas(explode, _WARC_BYTES_SCHEMA))


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
