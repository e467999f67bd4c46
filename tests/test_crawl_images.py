"""Crawl + image-payload graft integration: image pages discovered by
the crawl validate against the corpus (pixels + caption,
BASELINE.json:15)."""

from __future__ import annotations

from simplecrawler_spark.config import CrawlConfig
from simplecrawler_spark.functions import images as I
from simplecrawler_spark.plans.crawl import FrontierCrawler
from simplecrawler_spark.sources.fetch import TableFetcher
from simplecrawler_spark.sources.fixtures import (
    crawler_server_rows, site_graph_df, synthetic_corpus,
)

BASE = "http://fixture:9999"


def test_crawl_then_validate_payload(spark, tmp_path):
    rows = crawler_server_rows(BASE)
    cfg = CrawlConfig()
    fetcher = TableFetcher(site_graph_df(spark, rows), cfg)
    crawler = FrontierCrawler(spark, fetcher, cfg, root=str(tmp_path / "c"))
    crawler.crawl(BASE)

    corpus = synthetic_corpus(spark, 4)
    out = crawler.validated_results(corpus)
    by_url = {r.url_norm: r for r in out.collect()}

    png = by_url[BASE + "/mime/image/png"]  # carries image_id img_00000001
    assert png.pixels_ok and png.phash_match
    assert png.psnr_db >= 40.0
    assert png.caption == I.synth_caption(1)
    # non-image pages ride through unvalidated
    assert by_url[BASE + "/hello"].pixels_ok is None
    assert len(by_url) == 6
