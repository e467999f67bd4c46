"""Training-batch assembly operators (operators/packing.py):
token-budget shard packing + domain-mix rebalancing.

No reference analogue (the reference stops at fetch+store,
crawler.py:240-260) — these pin the LLM-pipeline contract: packing is
a deterministic global layout whose shard assignment is independent
of parallelism, and rebalancing matches target domain fractions via
the portable md5 bucket, never a per-source rank window.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from simplecrawler_spark.functions.text import SPLIT_BUCKETS
from simplecrawler_spark.operators.packing import (
    pack_sequences,
    rebalance_mix,
)


def _docs(spark, n=400, words_lo=3, words_hi=40):
    # deterministic variable-length texts: doc k has (k % span) tokens
    span = words_hi - words_lo
    rows = [(k, " ".join(f"w{j}" for j in range(words_lo + k % span)))
            for k in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _h60(key: str, salt: str) -> int:
    return int(hashlib.md5((salt + key).encode()).hexdigest()[:15], 16)


def test_pack_sequences_matches_serial_recompute(spark):
    budget = 256
    out = {r.doc_id: (r.n_tokens, r.shard_id)
           for r in pack_sequences(_docs(spark), budget_tokens=budget,
                                   n_ranges=8).collect()}
    # serial ground truth: order by (md5 bucket, id), exclusive cumsum
    ordered = sorted(out, key=lambda k: (_h60(str(k), "pack|")
                                         % SPLIT_BUCKETS, k))
    off = 0
    for k in ordered:
        n_tok, shard = out[k]
        assert shard == off // budget, f"doc {k}"
        off += n_tok
    # every shard except the last begins exactly at a budget boundary
    # crossing: shard ids are contiguous 0..max
    shards = sorted({s for _, s in out.values()})
    assert shards == list(range(len(shards)))


def test_pack_sequences_invariant_to_n_ranges_and_layout(spark):
    docs = _docs(spark, n=300)
    a = {r.doc_id: r.shard_id
         for r in pack_sequences(docs, 512, n_ranges=1).collect()}
    b = {r.doc_id: r.shard_id
         for r in pack_sequences(docs.repartition(13), 512,
                                 n_ranges=7).collect()}
    c = {r.doc_id: r.shard_id
         for r in pack_sequences(docs.orderBy(F.desc("doc_id")), 512,
                                 n_ranges=64).collect()}
    assert a == b == c  # parallelism / input layout never move a doc


def test_pack_sequences_validates_budget(spark):
    with pytest.raises(ValueError):
        pack_sequences(_docs(spark, n=4), budget_tokens=0)
    with pytest.raises(ValueError):
        pack_sequences(_docs(spark, n=4), n_ranges=0)


def _mix_docs(spark, sizes: dict[str, int]):
    rows, k = [], 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((k, src))
            k += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_rebalance_mix_hits_target_fractions(spark):
    docs = _mix_docs(spark, {"web": 8000, "books": 1000, "code": 1000})
    out = rebalance_mix(docs, {"web": 0.6, "books": 0.3, "code": 0.1})
    kept = {r.source: r.n for r in
            out.where("keep").groupBy("source")
            .agg(F.count("*").alias("n")).collect()}
    # scale = min(8000/.6, 1000/.3, 1000/.1) = 3333 -> targets
    # web 2000, books 1000 (binding: keeps everything), code 333
    assert kept["books"] == 1000          # p=1.0 keeps all, exactly
    assert abs(kept["web"] - 2000) < 150  # binomial tolerance
    assert abs(kept["code"] - 333) < 70
    total = sum(kept.values())
    assert abs(kept["web"] / total - 0.6) < 0.04
    assert abs(kept["code"] / total - 0.1) < 0.03


def test_rebalance_mix_untargeted_sources_dropped_and_deterministic(spark):
    docs = _mix_docs(spark, {"web": 500, "books": 200, "junk": 300})
    tgt = {"web": 0.7, "books": 0.3}
    out = rebalance_mix(docs, tgt)
    assert out.where(F.col("source") == "junk").count() == 0
    assert out.count() == 700             # one row per targeted doc
    a = {r.doc_id: r.keep for r in out.collect()}
    b = {r.doc_id: r.keep for r in
         rebalance_mix(docs.repartition(11), tgt).collect()}
    assert a == b


def test_rebalance_mix_validates_fractions(spark):
    docs = _mix_docs(spark, {"web": 10})
    with pytest.raises(ValueError):
        rebalance_mix(docs, {"web": 0.5})          # sums to 0.5
    with pytest.raises(ValueError):
        rebalance_mix(docs, {"web": 1.2, "books": -0.2})


def test_assemble_epochs_copy_counts(spark):
    """Integer weights give exact copy counts; fractional weight 2.5
    gives 2 or 3 copies per doc with ~half the docs taking the 3rd;
    weight 0.5 downsamples to ~half; unlisted sources are dropped."""
    from simplecrawler_spark.operators.packing import assemble_epochs

    docs = spark.createDataFrame(
        [(i, ["a", "b", "c", "z"][i % 4]) for i in range(400)],
        "doc_id long, source string")
    out = assemble_epochs(docs, {"a": 2.0, "b": 2.5, "c": 0.5})
    per = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per["a"] == 200                 # exactly 2x of 100 docs
    assert 220 <= per["b"] <= 280          # ~2.5x of 100
    assert 30 <= per["c"] <= 70            # ~0.5x of 100
    assert "z" not in per
    # per-doc copy numbering is dense 0..n-1
    copies = (out.where(F.col("source") == "a")
              .groupBy("doc_id").agg(F.sort_array(
                  F.collect_list("copy")).alias("cs")).collect())
    assert all(r.cs == [0, 1] for r in copies)


def test_assemble_epochs_deterministic_and_unique_keys(spark):
    from simplecrawler_spark.operators.packing import assemble_epochs

    docs = spark.createDataFrame(
        [(i, "a") for i in range(50)], "doc_id long, source string")
    a = sorted(map(tuple, assemble_epochs(docs, {"a": 1.75}).collect()))
    b = sorted(map(tuple, assemble_epochs(docs, {"a": 1.75}).collect()))
    assert a == b  # reproducible across runs
    keys = [t[3] for t in a]
    assert len(set(keys)) == len(keys)  # order_key unique per copy


def test_assemble_epochs_plan_has_no_exchange(spark):
    """The operator itself must not shuffle — fan-out and keying are
    narrow; the epoch's one global sort belongs to the consumer."""
    from simplecrawler_spark.operators.packing import assemble_epochs

    docs = spark.createDataFrame(
        [(1, "a")], "doc_id long, source string")
    plan = (assemble_epochs(docs, {"a": 2.0})
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_assemble_epochs_validates_weights(spark):
    from simplecrawler_spark.operators.packing import assemble_epochs

    docs = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError):
        assemble_epochs(docs, {})
    with pytest.raises(ValueError):
        assemble_epochs(docs, {"a": -1.0})


def test_pack_weighted_bytes_budget(spark):
    """pack_weighted with byte weights (the webdataset image case):
    consecutive shard ids, every shard's weight stays near budget
    (a shard exceeds it only via its straddling last row), and the
    assignment is parallelism-invariant (n_ranges changes nothing)."""
    from simplecrawler_spark.operators.packing import pack_weighted

    docs = spark.createDataFrame(
        [(i, 1000 + (i * 137) % 3000) for i in range(200)],
        "doc_id long, nbytes long")
    out = pack_weighted(docs, F.col("nbytes"), budget=10_000,
                        weight_name="n_bytes")
    rows = out.collect()
    assert len(rows) == 200
    per_shard = {}
    for r in rows:
        per_shard.setdefault(r.shard_id, 0)
        per_shard[r.shard_id] += r.n_bytes
    sids = sorted(per_shard)
    assert sids == list(range(len(sids)))  # dense, consecutive
    # every shard but the last spans >= budget only through overhang
    for sid in sids[:-1]:
        assert per_shard[sid] >= 10_000 - 4000  # first unit in-shard
    a = sorted(map(tuple, rows))
    b = sorted(map(tuple, pack_weighted(
        docs, F.col("nbytes"), budget=10_000, weight_name="n_bytes",
        n_ranges=7).collect()))
    assert a == b  # n_ranges is parallelism only, never assignment


def test_temperature_weights_hand_values(spark):
    """τ=0.5 over counts {a:100, b:400}: weights 10·s and 20·s, so
    shares are exactly 333333/666666 ppm; τ=1 reproduces the natural
    mixture."""
    from simplecrawler_spark.operators.packing import (
        temperature_weights,
    )

    rows = ([(i, "a") for i in range(100)]
            + [(1000 + i, "b") for i in range(400)])
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {r.source: r
           for r in temperature_weights(df, tau=0.5).collect()}
    assert got["a"].w_scaled == 10_000_000
    assert got["b"].w_scaled == 20_000_000
    assert got["a"].p_ppm == 333_333 and got["b"].p_ppm == 666_666

    nat = {r.source: r.p_ppm
           for r in temperature_weights(df, tau=1.0).collect()}
    assert nat["a"] == 200_000 and nat["b"] == 800_000


def test_temperature_weights_validates(spark):
    import pytest

    from simplecrawler_spark.operators.packing import (
        temperature_weights,
    )

    df = spark.createDataFrame([(0, "a")], "doc_id long, source string")
    with pytest.raises(ValueError):
        temperature_weights(df, tau=0.0)
