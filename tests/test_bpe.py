"""BPE tokenizer (functions/bpe.py): the merge loop is pytest-pinned
(hand-derivable Sennrich-style fixture + properties) while the
distributed pair statistics carry the DuckDB oracle (q_bpe_pairs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simplecrawler_spark.functions import bpe

CORPUS = ("low low low low low lower lower newest newest newest "
          "newest newest newest widest widest widest")


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame([(0, CORPUS)],
                                 "doc_id long, text string")


def test_pair_counts_classic_fixture(docs):
    """Hand-computable: 'es','st','t</w>' each ride newest(6)+widest(3)
    = 9; 'we' rides lower(2)+newest(6) = 8; 'lo' rides low(5)+lower(2)
    = 7."""
    got = {(r.a, r.b): r.pair_count
           for r in bpe.pair_counts(bpe.word_freqs(docs)).collect()}
    assert got[("e", "s")] == 9 and got[("s", "t")] == 9
    assert got[("t", "</w>")] == 9
    assert got[("w", "e")] == 8
    assert got[("l", "o")] == 7


def test_bpe_train_merge_order(docs):
    """First merges follow max pair count with the lexicographic
    tie-break: ('e','s') beats ('s','t') and ('t','</w>') at 9, then
    the fused symbols keep winning ('es','t'), ('est','</w>')."""
    merges = bpe.bpe_train(docs, n_merges=5)
    assert merges[:3] == [("e", "s"), ("es", "t"), ("est", "</w>")]
    # deterministic: identical run, identical table
    assert merges == bpe.bpe_train(docs, n_merges=5)


def test_bpe_encode_applies_ranks(spark, docs):
    """A training word encodes to its fully-merged form; an UNSEEN
    word reuses learned subwords ('lowest' -> low + est</w>); a word
    sharing no merges falls back to characters."""
    merges = bpe.bpe_train(docs, n_merges=10)
    test = spark.createDataFrame(
        [(1, "newest"), (2, "lowest"), (3, "zq")],
        "doc_id long, text string")
    got = {r.doc_id: r.subwords
           for r in bpe.bpe_encode(test, merges).collect()}
    assert got[1] == ["newest</w>"]
    assert got[2] == ["low", "est</w>"]
    assert got[3] == ["z", "q", "</w>"]


def test_bpe_encode_roundtrip_property(spark, docs):
    """Concatenating a word's subwords (minus the marker) always
    reconstructs the word — merges never lose or reorder characters."""
    merges = bpe.bpe_train(docs, n_merges=8)
    test = spark.createDataFrame(
        [(i, w) for i, w in enumerate(
            ["low", "lower", "lowest", "newest", "wide", "news"])],
        "doc_id long, text string")
    for r in bpe.bpe_encode(test, merges).collect():
        word = "".join(r.subwords).replace(bpe.END_OF_WORD, "")
        assert word == test.collect()[r.doc_id].text


def test_bpe_train_caps_driver_state(spark):
    """max_words truncates the frequency table highest-freq-first:
    with the cap at 1 only the dominant word trains, so every merge
    involves its symbols."""
    df = spark.createDataFrame(
        [(0, "aaa aaa aaa bcd")], "doc_id long, text string")
    merges = bpe.bpe_train(df, n_merges=3, max_words=1)
    flat = "".join(a + b for a, b in merges)
    assert set(flat) <= set("a" + bpe.END_OF_WORD)


def test_bpe_train_validates(docs):
    with pytest.raises(ValueError):
        bpe.bpe_train(docs, n_merges=0)


def test_bpe_encode_null_text(spark, docs):
    merges = bpe.bpe_train(docs, n_merges=2)
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    rows = bpe.bpe_encode(df, merges).collect()
    assert rows[0].subwords is None


def test_pair_counts_plan_is_jvm_partial_agg(docs):
    """The corpus-scale statistics stage must be pure JVM with
    map-side partial aggregation on the pair key."""
    plan = (bpe.pair_counts(bpe.word_freqs(docs))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan
    assert "partial" in plan.lower()
