"""Streaming NEAR-dup dedup — incremental MinHash-LSH across
micro-batches (round-4 verdict item 6).

The exact streaming path (dedup_stream.py) keys on one fingerprint
per doc; near-dup needs the LSH band-key currency: a doc is a
candidate duplicate when ANY of its (band, key) rows collides. The
batch pipeline gets this from minhash_lsh_pairs + connected
components; a LIVE crawl+curate pipeline must not re-run batch LSH
over the ever-growing corpus per increment. The incremental shape is
the seen-table discipline applied at band-key grain:

    batch → band keys (operators/dedup.minhash_band_keys)
          → in-batch candidate pairs → connected components →
            component representative = min doc id
          → any member's key collides with the durable band_keys
            TABLE → the whole component drops (it chains, through
            that member, to an earlier survivor)
          → surviving representatives append to docs; their DISTINCT
            band keys append to band_keys; one snapshot commit

State lives in the SnapshotStore, not the streaming state store, so
it survives query restarts exactly like StreamDedup: re-instantiate
over the same root and the band_keys table reloads from the latest
committed manifest.

Contract (candidate-grain, conservative — the dedup_against
``method="minhash"`` policy): no doc EVER survives whose band keys
collide with an earlier survivor's. Near-dup chains that only
connect ACROSS batches through non-surviving members (A~B, B~C,
C arriving after B was dropped) can admit a doc a single-batch run
would have collapsed — the standard incremental-LSH relaxation;
within a batch the component closure is exact. Processing the whole
corpus as ONE batch equals the batch twin ``neardup_survivors``
(parity pinned by tests/test_streaming.py), and splitting a corpus
whose near-dups collide directly with their base doc into id-ordered
micro-batches yields the identical survivor set.

Scale shape per batch: band keys are short strings (never text);
the reference side of the collision check is the durable table,
DISTINCT at key grain; components run over in-batch pairs only
(micro-batch-bounded). Cross-batch state grows by n_bands rows per
SURVIVOR, not per ingested doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simplecrawler_spark.operators.dedup import (
    connected_components, minhash_band_keys,
)
from simplecrawler_spark.plans.tables import SnapshotStore

__all__ = ["neardup_survivors", "StreamNearDedup"]


def neardup_survivors(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n_hashes: int = 8,
                      band_rows: int = 2, k: int = 3) -> DataFrame:
    """Batch twin: band-collision pairs → connected components → one
    survivor (min id) per component; docs colliding with nothing —
    including shingle-less short docs — survive as singletons.
    Returns (doc_id) rows, the streamed output's column."""
    keys = minhash_band_keys(docs, text_col, id_col, n_hashes,
                             band_rows, k)
    a, b = keys.alias("a"), keys.alias("b")
    pairs = (a.join(b, ["band", "key"])
             .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"))
             .distinct())
    comp = connected_components(pairs)
    losers = comp.where(~F.col("is_survivor")).select("doc_id")
    return (docs.select(F.col(id_col).cast("long").alias("doc_id"))
            .distinct()
            .join(losers, "doc_id", "left_anti"))


class StreamNearDedup:
    """Owns the durable band-key state and exposes the foreachBatch
    sink. Same lifecycle as dedup_stream.StreamDedup: one snapshot
    commit per batch, resume by re-instantiating over ``root``."""

    def __init__(self, spark: SparkSession, root: str,
                 text_col: str = "text", id_col: str = "doc_id",
                 n_hashes: int = 8, band_rows: int = 2, k: int = 3):
        from pyspark.sql import types as T

        keys_schema = T.StructType([
            T.StructField("band", T.IntegerType()),
            T.StructField("key", T.StringType()),
        ])
        docs_schema = T.StructType([
            T.StructField("doc_id", T.LongType()),
        ])
        self.spark = spark
        self.text_col, self.id_col = text_col, id_col
        self.n_hashes, self.band_rows, self.k = n_hashes, band_rows, k
        self.store = SnapshotStore(spark, root, schemas={
            "band_keys": keys_schema, "docs": docs_schema})
        self._batches = 0

    def sink(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body: keys → in-batch components → reference
        collision drop → append survivors + their keys, commit."""
        ic = self.id_col
        keys = minhash_band_keys(
            batch_df, self.text_col, ic, self.n_hashes,
            self.band_rows, self.k).persist()
        ids = (batch_df.select(F.col(ic).cast("long").alias("doc_id"))
               .distinct())

        a, b = keys.alias("a"), keys.alias("b")
        pairs = (a.join(b, ["band", "key"])
                 .where(F.col(f"a.{ic}") < F.col(f"b.{ic}"))
                 .select(F.col(f"a.{ic}").alias("id_a"),
                         F.col(f"b.{ic}").alias("id_b"))
                 .distinct())
        comp = connected_components(pairs).select("doc_id", "component")
        labeled = (ids.join(comp, "doc_id", "left")
                   .select("doc_id",
                           F.coalesce("component", "doc_id")
                           .alias("component")))

        # any member colliding with the durable table contaminates
        # its whole in-batch component (it chains to an earlier
        # survivor through that member)
        hit = (keys.join(self.store.read("band_keys"),
                         ["band", "key"], "left_semi")
               .select(F.col(ic).cast("long").alias("doc_id"))
               .distinct())
        bad_comps = (labeled.join(hit, "doc_id", "left_semi")
                     .select("component").distinct())
        survivors = (labeled
                     .groupBy("component")
                     .agg(F.min("doc_id").alias("doc_id"))
                     .join(bad_comps, "component", "left_anti")
                     .select("doc_id"))

        self.store.append("docs", survivors, partition=f"b{batch_id}")
        # the survivors append ran the whole pipeline once; the key
        # rows re-derive from the WRITTEN file (staged-file
        # discipline, plans/crawl.py round body)
        path = self.store._pending["docs"][-1]["path"]
        written = self.spark.read.parquet(path)
        skeys = (keys.withColumnRenamed(ic, "doc_id")
                 .join(written, "doc_id", "left_semi")
                 .select("band", "key").distinct())
        self.store.append("band_keys", skeys, partition=f"b{batch_id}")
        keys.unpersist()
        self._batches += 1
        self.store.commit_snapshot(self._batches)

    def survivors(self) -> DataFrame:
        return self.store.read("docs")

    def attach(self, docs_stream: DataFrame):
        """writeStream wiring for a streaming docs DataFrame."""
        return docs_stream.writeStream.foreachBatch(self.sink)


def stream_neardup(spark: SparkSession, source_dir: str, root: str,
                   checkpoint_dir: str, **kw):
    """Convenience wiring: parquet drop-directory of document rows →
    StreamNearDedup sink. Returns (StreamNearDedup, DataStreamWriter)."""
    snd = StreamNearDedup(spark, root, **kw)
    src = (spark.readStream
           .schema("doc_id long, text string, lang string, "
                   "source string, n_chars long")
           .option("maxFilesPerTrigger", 1)
           .parquet(source_dir))
    writer = (snd.attach(src)
              .option("checkpointLocation", checkpoint_dir))
    return snd, writer
