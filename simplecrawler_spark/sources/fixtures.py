"""Deterministic synthetic fixtures (FIXTURES.md §1, §3, §6).

Replaces the reference's in-process Flask fixture server
(/root/reference/tests/conftest.py:37-67 + routes in
tests/test_crawler.py:40-93) with table-driven equivalents:

* `crawler_server_rows` / `cli_rows` / `robots_txt_rows` — the exact
  route graphs the reference tests crawl, as site_graph rows.
* `synthetic_graph` — Spark-expression-generated link graph at bench
  scale (Zipf-skewed hot hosts to exercise salted repartitioning); no
  driver-side loops, so it generates 10^6+ pages distributively.
* `synthetic_corpus` — seeded numpy image+caption corpus
  (BASELINE.json:15 input_hint schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simplecrawler_spark.functions.canonical import canon_parts
from simplecrawler_spark.plans import schemas


def make_html_from_links(paths) -> str:
    """Same shape as the reference HTML builders
    (/root/reference/tests/conftest.py:13-30)."""
    body = "<br>".join(f'<a href="{p}">another link</a>' for p in paths)
    return f"<html><head></head><body>{body}</body></html>"


def _row(url, status=200, content_type="text/html", body=None,
         redirect_location=None, ua_required=None, image_id=None):
    return {
        "url": url, "url_norm": canon_parts(url)[0], "status": status,
        "content_type": content_type, "body": body,
        "redirect_location": redirect_location, "ua_required": ua_required,
        "image_id": image_id,
    }


def site_graph_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    return spark.createDataFrame(
        [tuple(r[f] for f in schemas.SITE_GRAPH.fieldNames()) for r in rows],
        schemas.SITE_GRAPH,
    )


def crawler_server_rows(base: str = "http://fixture:9999",
                        robots_txt: str | None = None) -> list[dict]:
    """The crawler_server graph (reference tests/test_crawler.py:40-93).

    Expected visited set for a crawl of `base` =
    {/, /hello, /world, /mime/text/pdf, /mime/image/png, /mime/text/css}
    (test_crawler.py:45-52, asserted at :237-239).
    """
    links = [base + "/", base + "/hello", base + "/world",
             base + "/mime/text/pdf", base + "/mime/image/png",
             base + "/mime/text/css"]
    dont_find = ["https://subdomain.example.com/", "https://www.example.com/",
                 base + "/hello", "/world", "/error/400", "/error/500"]
    rows = [
        _row(base + "/", body=make_html_from_links(links + dont_find)),
        _row(base + "/hello",
             body="<html><body><a href='/world'>world</a></body></html>"),
        _row(base + "/world",
             body="<html><body><a href='/hello'>hello</a></body></html>"),
        _row(base + "/mime/text/pdf", content_type="text/pdf", body=""),
        _row(base + "/mime/image/png", content_type="image/png", body="",
             image_id="img_00000001"),
        _row(base + "/mime/text/css", content_type="text/css", body=""),
        _row(base + "/error/400", status=400),
        _row(base + "/error/500", status=500),
        _row(base + "/redirect/hello", status=302, redirect_location="/hello"),
    ]
    if robots_txt is not None:
        rows.append(_row(base + "/robots.txt", content_type="text/plain",
                         body=robots_txt))
    return rows


def cli_rows(base: str = "http://fixture:9999") -> list[dict]:
    """The cli-test graph (reference tests/test_cli.py:80-104):
    /, /hello, /world, /hello/world fully interlinked + /error (500)
    + /hello.pdf (text/pdf)."""
    pages = ["/", "/hello", "/world", "/hello/world"]
    extras = ["/error", "/hello.pdf"]
    rows = [
        _row(base + p, body=make_html_from_links(
            [base + q for q in pages] + extras)) for p in pages
    ]
    rows.append(_row(base + "/error", status=500))
    rows.append(_row(base + "/hello.pdf", content_type="text/pdf", body=""))
    return rows


ROBOTS_FIXTURE_TXT = """
User-agent: Tester
Allow: /this/
Allow: /that/
Disallow: /hello
Disallow: /world
Crawl-delay: 1

User-agent: NotAnyOtherAgent
Disallow: /
"""


def graph_from_edges(spark: SparkSession, edges: DataFrame, n_nodes: int,
                     base: str = "http://graph.test") -> DataFrame:
    """site_graph with one page per node 0..n_nodes-1; page i's body
    links to its out-neighbours (relative hrefs). Edge endpoints must
    already be in [0, n_nodes). Built with expressions + one groupBy —
    scales with the edge table."""
    pages = spark.range(n_nodes).select(F.col("id").alias("node"))
    adj = (edges.groupBy(F.col("src").alias("node"))
           .agg(F.collect_set("dst").alias("dsts")))
    joined = pages.join(adj, "node", "left")
    hrefs = F.transform(
        F.coalesce("dsts", F.array().cast("array<long>")),
        lambda d: F.concat(F.lit("/p"), d.cast("string")))
    body = F.concat(
        F.lit("<html><head></head><body>"),
        F.array_join(F.transform(
            hrefs, lambda h: F.concat(F.lit('<a href="'), h,
                                      F.lit('">x</a>'))), "<br>"),
        F.lit("</body></html>"))
    url = F.concat(F.lit(base + "/p"), F.col("node").cast("string"))
    return joined.select(
        url.alias("url"), url.alias("url_norm"),
        F.lit(200).alias("status"),
        F.lit("text/html").alias("content_type"), body.alias("body"),
        F.lit(None).cast("string").alias("redirect_location"),
        F.lit(None).cast("string").alias("ua_required"),
        F.lit(None).cast("string").alias("image_id"))


NEAR_DUP_ID_OFFSET = 100_000  # variant of base k carries id k + offset


def corpus_record(k: int, seed: int = 42, perturbed: bool = False) -> dict:
    """One deterministic corpus row (input_hint schema). With
    ``perturbed`` the pixels are a mild noise variant of base image k
    (images.perturb_pixels) carried under id k + NEAR_DUP_ID_OFFSET —
    a planted pHash near-duplicate. Shared by the Spark fixtures below
    AND the DuckDB oracle literal builders (__spark_entry__), so both
    engines see byte-identical rows."""
    from simplecrawler_spark.functions import images as I

    px = I.synth_pixels(k, seed)
    rid = k
    if perturbed:
        px = I.perturb_pixels(px, k, seed)
        rid = k + NEAR_DUP_ID_OFFSET
    fmt = "raw" if k % 2 == 0 else "pngz"
    data = I.encode_pixels(px, fmt)
    return {
        "image_id": I.image_id_of(rid),
        "bytes": data,
        "w": px.shape[1], "h": px.shape[0], "fmt": fmt,
        "caption": I.synth_caption(k),
        "phash": I.phash64(
            I.decode_pixels(data, fmt, px.shape[1], px.shape[0])),
    }


def synthetic_corpus(spark: SparkSession, n_images: int,
                     seed: int = 42) -> DataFrame:
    """Deterministic image+caption corpus (input_hint schema,
    BASELINE.json:15). Generated distributively: spark.range →
    mapInPandas, one numpy image per row; even/odd ids alternate
    lossless 'raw' / lossy 'pngz'."""

    def gen(iterator):
        import pandas as pd

        for pdf in iterator:
            recs = [corpus_record(int(k), seed) for k in pdf["id"]]
            yield pd.DataFrame(recs, columns=schemas.CORPUS.fieldNames())

    return spark.range(n_images).mapInPandas(gen, schemas.CORPUS)


def near_dup_corpus(spark: SparkSession, n_images: int,
                    seed: int = 42, every: int = 3) -> DataFrame:
    """synthetic_corpus plus a planted near-duplicate (perturbed
    pixels, id k + NEAR_DUP_ID_OFFSET) for every ``every``-th base
    image — the ground-truth input for pHash near-dup clustering."""

    def gen(iterator):
        import pandas as pd

        for pdf in iterator:
            recs = []
            for k in pdf["id"]:
                k = int(k)
                recs.append(corpus_record(k, seed))
                if k % every == 0:
                    recs.append(corpus_record(k, seed, perturbed=True))
            yield pd.DataFrame(recs, columns=schemas.CORPUS.fieldNames())

    return spark.range(n_images).mapInPandas(gen, schemas.CORPUS)


# ---------------------------------------------------------------------------
# Bench-scale synthetic graph — pure Spark expressions, no driver loop
# ---------------------------------------------------------------------------

def synthetic_graph(spark: SparkSession, n_pages: int, n_hosts: int = 64,
                    out_degree: int = 8, seed: int = 42,
                    scheme_host: str = "http://h{hid}.test") -> DataFrame:
    """Deterministic link graph: page i lives on host zipf(i), links to
    `out_degree` pseudo-random pages. Host assignment is power-skewed
    (hot host 0 holds ~sqrt share) to exercise salting/AQE skew joins.

    Generated entirely with Spark expressions over spark.range —
    scales to 10^8+ rows without touching the driver.
    """
    pid = F.col("id")

    def host_of(col):
        # power-law skew: u^2 concentrates mass near host 0
        u = (F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0)
        return F.floor(u * u * n_hosts).cast("int")

    def url_of(col, hid):
        return F.concat(
            F.lit("http://h"), hid.cast("string"), F.lit(".test/p/"),
            col.cast("string"),
        )

    df = spark.range(n_pages).select(
        pid.alias("pid"), host_of(pid).alias("hid"))
    targets = F.array(*[
        F.pmod(F.xxhash64(F.col("pid"), F.lit(seed + 1000 + j)),
               F.lit(n_pages))
        for j in range(out_degree)
    ])
    df = df.withColumn("targets", targets)
    hrefs = F.transform(
        "targets", lambda t: url_of(t, host_of(t)))
    body = F.concat(
        F.lit("<html><head></head><body>"),
        F.array_join(F.transform(
            hrefs, lambda h: F.concat(F.lit('<a href="'), h, F.lit('">x</a>'))),
            "<br>"),
        F.lit("</body></html>"),
    )
    url = url_of(F.col("pid"), F.col("hid"))
    return df.select(
        url.alias("url"),
        url.alias("url_norm"),  # canonical by construction
        F.lit(200).alias("status"),
        F.lit("text/html").alias("content_type"),
        body.alias("body"),
        F.lit(None).cast("string").alias("redirect_location"),
        F.lit(None).cast("string").alias("ua_required"),
        F.concat(F.lit("img_"), F.lpad(F.col("pid").cast("string"), 8, "0")
                 ).alias("image_id"),
    )
