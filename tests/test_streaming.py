"""Structured Streaming seed ingestion → frontier staging."""

from __future__ import annotations

import os

from simplecrawler_spark.plans import schemas
from simplecrawler_spark.plans.tables import SnapshotStore
from simplecrawler_spark.streaming.ingest import stream_seeds


def test_stream_seeds_canonicalises_and_dedupes(spark, tmp_path):
    src = tmp_path / "drop"
    src.mkdir()
    (src / "a.txt").write_text(
        "HTTP://Example.COM./p one\n"
        "http://example.com/p%20one\n"           # same canonical form
        "http://other.test/x?b=2&a=1\n"
        "\n")
    (src / "b.txt").write_text(
        "http://other.test/x?a=1&b=2\n"          # dup of sorted-param url
        "http://third.test/y\n")

    store = SnapshotStore(spark, str(tmp_path / "tables"),
                          schemas={"frontier": schemas.FRONTIER})
    q = stream_seeds(spark, str(src), store, round_no=0,
                     checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    rows = {r.url_norm for r in
            store.read("frontier").select("url_norm").collect()}
    assert rows == {
        "http://example.com/p%20one",
        "http://other.test/x?a=1&b=2",
        "http://third.test/y",
    }
    got = store.read("frontier").where("url_norm like '%third%'").first()
    assert got.url_hash is not None and got.round == 0
    assert os.path.isdir(str(tmp_path / "ckpt"))
