"""Lexical retrieval / vocabulary operators (operators/retrieval.py)
and caption-collision clustering (functions/multimodal.py).

No reference analogue (the reference stores pages, it does not rank or
sample them) — these pin the LLM-pipeline contract: vocabulary top-k
is a deterministic total order, BM25 matches the hand-computed Okapi
formula, stratified samples are reproducible and growth-stable, and
caption clusters key on the normalised text only.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from simplecrawler_spark.functions.multimodal import caption_dup_clusters
from simplecrawler_spark.operators.retrieval import (
    bm25_score,
    ngram_topk,
    ngrams_expr,
    stratified_sample,
)


# ---------------------------------------------------------------------------
# ngrams / vocabulary
# ---------------------------------------------------------------------------

def test_ngrams_expr_short_docs(spark):
    df = spark.createDataFrame(
        [("",), ("solo",), ("two words",), ("a b c",)], "text string")
    rows = df.select(ngrams_expr(F.col("text"), 2).alias("g")).collect()
    assert rows[0].g == []          # empty doc
    assert rows[1].g == []          # 1 token < n
    assert rows[2].g == ["two words"]
    assert rows[3].g == ["a b", "b c"]


def test_ngram_topk_counts_and_tiebreak(spark):
    df = spark.createDataFrame(
        [("x y x y",), ("x y z",), ("a b",), ("b a",)], "text string")
    # bigram counts: "x y"=3, "y x"=1, "y z"=1, "a b"=1, "b a"=1
    out = ngram_topk(df, n=2, k=3, text_col="text").collect()
    assert [(r.gram, r.n_occurrences) for r in out] == [
        ("x y", 3), ("a b", 1), ("b a", 1)]  # ties break gram ASC


def test_ngram_topk_unigrams(spark):
    df = spark.createDataFrame([("b a b",), ("a b",)], "text string")
    out = ngram_topk(df, n=1, k=2).collect()
    assert [(r.gram, r.n_occurrences) for r in out] == [("b", 3), ("a", 2)]


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

def _bm25_ref(tf, df, n_docs, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_bm25_matches_hand_formula(spark):
    docs = spark.createDataFrame(
        [(0, "spark spark join"), (1, "join table"), (2, "row scan")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           bm25_score(docs, ["spark", "join"]).collect()}
    avgdl = (3 + 2 + 2) / 3
    want0 = (_bm25_ref(2, 1, 3, 3, avgdl)    # spark: tf=2, df=1
             + _bm25_ref(1, 2, 3, 3, avgdl))  # join: tf=1, df=2
    want1 = _bm25_ref(1, 2, 3, 2, avgdl)
    assert out[0].bm25 == pytest.approx(want0, rel=1e-12)
    assert out[1].bm25 == pytest.approx(want1, rel=1e-12)
    assert out[2].bm25 == 0.0                 # no query terms → 0, kept
    assert out[2].n_tokens == 2


def test_bm25_scaled_mode_close_to_float(spark):
    docs = spark.createDataFrame(
        [(k, f"spark join w{k} w{k % 3}") for k in range(20)],
        "doc_id long, text string")
    f = {r.doc_id: r.bm25 for r in
         bm25_score(docs, ["spark", "w1"]).collect()}
    s = {r.doc_id: r.bm25 for r in
         bm25_score(docs, ["spark", "w1"], ln_scale=10**9).collect()}
    for k in f:
        assert s[k] == pytest.approx(f[k], abs=1e-8)


def test_bm25_absent_term_contributes_nothing(spark):
    docs = spark.createDataFrame(
        [(0, "spark join"), (1, "join scan")], "doc_id long, text string")
    with_ghost = {r.doc_id: r.bm25 for r in
                  bm25_score(docs, ["spark", "zzz_absent"]).collect()}
    without = {r.doc_id: r.bm25 for r in
               bm25_score(docs, ["spark"]).collect()}
    assert with_ghost == without


def test_bm25_requires_terms(spark):
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_score(docs, [])


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------

def _corpus(spark, n=300, sources=3):
    return spark.createDataFrame(
        [(k, f"s{k % sources}", f"text {k}") for k in range(n)],
        "doc_id long, source string, text string")


def test_stratified_sample_size_and_determinism(spark):
    docs = _corpus(spark)
    a = stratified_sample(docs, n_per_group=10)
    sizes = {r.source: r.n for r in
             a.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"s0": 10, "s1": 10, "s2": 10}
    ids_a = sorted(r.doc_id for r in a.collect())
    ids_b = sorted(r.doc_id for r in
                   stratified_sample(docs, n_per_group=10).collect())
    assert ids_a == ids_b


def test_stratified_sample_growth_stability(spark):
    """Reservoir property: growing the corpus only ever DISPLACES
    members (new smaller keys push out the largest) — a sampled doc's
    rank key never changes, so the old sample ∩ new corpus sample is
    exactly the old members whose keys still rank ≤ n."""
    small = _corpus(spark, n=150)
    big = _corpus(spark, n=300)
    s_small = {(r.source, r.doc_id): r.sample_rank
               for r in stratified_sample(small, 10).collect()}
    s_big = {(r.source, r.doc_id): r.sample_rank
             for r in stratified_sample(big, 10).collect()}
    # any survivor present in both samples can only have moved UP in
    # rank-key order? No — new docs with smaller keys push it DOWN.
    for key, rank_small in s_small.items():
        if key in s_big:
            assert s_big[key] >= rank_small
    # and no doc_id < 150 appears in s_big that was not in s_small:
    # its key was already there — absent from the small sample means
    # ranked > n among a SUBSET, so it ranks even lower in the superset
    for (src, did) in s_big:
        if did < 150:
            assert (src, did) in s_small


def test_stratified_sample_rank_is_dense(spark):
    docs = _corpus(spark, n=60, sources=2)
    out = stratified_sample(docs, n_per_group=5)
    for src in ("s0", "s1"):
        ranks = sorted(r.sample_rank for r in
                       out.where(F.col("source") == src).collect())
        assert ranks == [1, 2, 3, 4, 5]


# ---------------------------------------------------------------------------
# caption-collision clustering
# ---------------------------------------------------------------------------

def test_caption_dup_clusters_normalises(spark):
    corpus = spark.createDataFrame(
        [("img_a", "A Red  Fox #0001"),
         ("img_b", "a red fox #0937"),
         ("img_c", "  a  red fox "),
         ("img_d", "a blue fox #2")],
        "image_id string, caption string")
    out = {r.image_id: r for r in caption_dup_clusters(corpus).collect()}
    assert set(out) == {"img_a", "img_b", "img_c"}
    assert {r.cluster_id for r in out.values()} == {"img_a"}
    assert {r.cluster_size for r in out.values()} == {3}


def test_caption_dup_clusters_min_cluster_and_tag_opt(spark):
    corpus = spark.createDataFrame(
        [("img_a", "a red fox #1"), ("img_b", "a red fox #2")],
        "image_id string, caption string")
    # strip_tag=False: '#1' vs '#2' differ → no cluster of ≥2
    assert caption_dup_clusters(corpus, strip_tag=False).count() == 0
    # min_cluster=1: every image is its own (or shared) cluster
    out = caption_dup_clusters(corpus, min_cluster=1).collect()
    assert len(out) == 2


def test_rrf_fuse_math_and_overlap(spark):
    """Hand-checkable: doc 1 is rank 1 in both lists ->
    2*floor(1e12/61); doc 2 only in A at rank 2 -> floor(1e12/62);
    fused order puts the doubly-ranked doc first."""
    from simplecrawler_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank long")
    b = spark.createDataFrame([(1, 1), (3, 2)], "doc_id long, rank long")
    got = {r.doc_id: r for r in rrf_fuse([a, b], k=60).collect()}
    t1, t2 = 10 ** 12 // 61, 10 ** 12 // 62
    assert got[1].rrf_scaled == 2 * t1 and got[1].n_lists == 2
    assert got[2].rrf_scaled == t2 and got[2].n_lists == 1
    assert got[3].rrf_scaled == t2
    assert got[1].rrf_scaled > got[2].rrf_scaled


def test_rrf_fuse_validates(spark):
    from simplecrawler_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 1)], "doc_id long, rank long")
    with pytest.raises(ValueError):
        rrf_fuse([], k=60)
    with pytest.raises(ValueError):
        rrf_fuse([a], k=0)


def test_rrf_single_combinable_shuffle(spark):
    """Union + one groupBy sum: exactly one Exchange, partial aggs,
    no Python."""
    from simplecrawler_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 1)], "doc_id long, rank long")
    b = spark.createDataFrame([(1, 2)], "doc_id long, rank long")
    plan = (rrf_fuse([a, b])
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") <= 2  # one shuffle (+AQE read)
    assert "Python" not in plan
    assert "partial" in plan.lower()


def test_recall_at_k_exact_math(spark):
    """Hand-checkable hits: q0 perfect (1e6 ppm), q1 partial with a
    duplicate approx id that must not double-count, q2 zero-hit and
    missing from approx entirely."""
    from simplecrawler_spark.operators.retrieval import recall_at_k

    exact = spark.createDataFrame(
        [(0, 10), (0, 11), (1, 20), (1, 21), (1, 22), (2, 30)],
        "query_id long, id long")
    approx = spark.createDataFrame(
        [(0, 10), (0, 11), (1, 20), (1, 20), (1, 99)],
        "query_id long, id long")
    got = {r.query_id: r
           for r in recall_at_k(approx, exact).collect()}
    assert (got[0].n_hits, got[0].n_exact,
            got[0].recall_ppm) == (2, 2, 1_000_000)
    assert (got[1].n_hits, got[1].n_exact,
            got[1].recall_ppm) == (1, 3, 333_333)
    assert (got[2].n_hits, got[2].recall_ppm) == (0, 0)


def test_recall_at_k_measures_ivf_probe(spark):
    """End-to-end ANN eval: IVF-probed top-k vs brute-force top-k
    through recall_at_k; full-probe (nprobe = n_cells) recall must be
    exactly 1e6 ppm per query."""
    from simplecrawler_spark.operators.retrieval import recall_at_k
    from simplecrawler_spark.operators.similarity import (
        ann_ivf_topk_join, ivf_assign, ivf_centroids,
    )

    import numpy as np
    rng = np.random.RandomState(7)
    emb = spark.createDataFrame(
        [(i, rng.randn(8).tolist()) for i in range(120)],
        "id long, embedding array<double>")
    cents = ivf_centroids(emb, n_cells=4, id_col="id")
    assigned = ivf_assign(emb, cents)
    queries = spark.createDataFrame(
        [(q, rng.randn(8).tolist()) for q in range(3)],
        "query_id long, embedding array<double>")
    approx = ann_ivf_topk_join(emb, queries, k=5, n_cells=4, nprobe=4,
                               id_col="id", centroids=cents,
                               assigned=assigned)
    # brute force: score every (query, id) pair, window top-5
    from pyspark.sql import Window

    from simplecrawler_spark.operators.similarity import (
        cosine_cols_expr,
    )
    pairs = (queries.select("query_id",
                            F.col("embedding").alias("qv"))
             .crossJoin(emb.select("id",
                                   F.col("embedding").alias("dv"))))
    scored = pairs.select(
        "query_id", "id",
        cosine_cols_expr(F.col("qv"), F.col("dv")).alias("cos"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("id").asc())
    exact = (scored.withColumn("r", F.row_number().over(w))
             .where(F.col("r") <= 5).select("query_id", "id"))
    rec = recall_at_k(approx.select("query_id",
                                    F.col("id").alias("id")),
                      exact)
    for r in rec.collect():
        assert r.recall_ppm == 1_000_000, r


def test_recall_at_k_plan_no_python(spark):
    from simplecrawler_spark.operators.retrieval import recall_at_k

    a = spark.createDataFrame([(0, 1)], "query_id long, id long")
    e = spark.createDataFrame([(0, 1)], "query_id long, id long")
    plan = (recall_at_k(a, e)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_ndcg_perfect_and_degraded(spark):
    """A ranking in ideal order scores exactly 1e6 ppm; swapping the
    top two graded items scores less; a query with all-zero
    relevance reports 0 (idcg = 0 guard)."""
    from simplecrawler_spark.operators.retrieval import ndcg_at_k

    rels = spark.createDataFrame(
        [(0, 1, 3), (0, 2, 2), (0, 3, 0),
         (1, 1, 3), (1, 2, 2), (1, 3, 0),
         (2, 1, 0), (2, 2, 0)],
        "query_id long, id long, rel long")
    ranked = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (0, 3, 3),      # ideal order
         (1, 2, 1), (1, 1, 2), (1, 3, 3),      # top two swapped
         (2, 1, 1), (2, 2, 2)],                # all-zero rel
        "query_id long, id long, rank long")
    got = {r.query_id: r
           for r in ndcg_at_k(ranked, rels, k=10).collect()}
    assert got[0].ndcg_ppm == 1_000_000
    assert 0 < got[1].ndcg_ppm < 1_000_000
    assert got[2].ndcg_ppm == 0 and got[2].idcg_scaled == 0
    # hand value for the swap: dcg = 2/log2(2) + 3/log2(3), idcg =
    # 3/log2(2) + 2/log2(3); terms floored at 1e9 scale
    import math
    t = lambda rel, rank: math.floor(  # noqa: E731
        10**9 * rel / math.log2(rank + 1))
    dcg = t(2, 1) + t(3, 2)
    idcg = t(3, 1) + t(2, 2)
    assert got[1].dcg_scaled == dcg
    assert got[1].ndcg_ppm == (dcg * 1_000_000) // idcg


def test_ndcg_unjudged_and_truncation(spark):
    """Ranked ids without judgments contribute 0; ranks beyond k are
    ignored."""
    from simplecrawler_spark.operators.retrieval import ndcg_at_k

    rels = spark.createDataFrame([(0, 1, 2)],
                                 "query_id long, id long, rel long")
    ranked = spark.createDataFrame(
        [(0, 99, 1), (0, 1, 2), (0, 98, 3)],
        "query_id long, id long, rank long")
    r = ndcg_at_k(ranked, rels, k=2).collect()[0]
    import math
    assert r.dcg_scaled == math.floor(10**9 * 2 / math.log2(3))
    assert r.idcg_scaled == 2 * 10**9
