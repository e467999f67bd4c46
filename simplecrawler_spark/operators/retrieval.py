"""Lexical retrieval / vocabulary analytics over the documents table.

Training-data pipelines need corpus-lexicon tooling next to the dedup
and quality families: a vocabulary builder (top n-grams feed tokenizer
training and boilerplate lists), a BM25 scorer (retrieval-based data
curation ranks documents against a probe query set), and deterministic
stratified sampling (fixed-size per-source audit/eval draws). The
reference crawler has no analogue (it stores pages, it does not rank
them) — these are the SURVEY §2.8 "beyond the reference" family, same
discipline as operators/quality.py: pure built-in expressions, map-side
combinable aggregates, broadcast corpus totals, and integer-scaled
floats wherever scores cross engines.

Scale shapes (the point at 100 TB):
  * ``ngram_topk``: explode → ONE map-side-combinable count agg →
    global top-k via orderBy+limit, which Spark executes as a
    per-partition TakeOrdered + driver merge of k-row heads — no global
    sort shuffle, no full result materialisation.
  * ``bm25_score``: the document side is filtered to query terms
    BEFORE any join (the per-(doc,term) frame is |q| rows per doc max),
    df/avgdl totals ride in via broadcast one-row frames, and the
    whole score is JVM expressions — no Python, no driver collect.
  * ``stratified_sample``: one hash-ranked window per group; state is
    bounded by n_per_group, skew is bounded by the group key's own
    cardinality (sources, not documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from simplecrawler_spark.functions.text import tokens_expr

__all__ = ["ngram_topk", "bm25_score", "stratified_sample", "rrf_fuse",
           "recall_at_k", "ndcg_at_k"]


def ngrams_expr(text, n: int = 2):
    """Space-joined word n-grams of ``text`` as an array<string>.

    Built from the same tokens_expr every text operator uses, via
    HOFs only: transform over a 1..len-n+1 sequence, slicing the token
    array. Oracle twin (DuckDB): list_transform(range(...), i ->
    array_to_string(toks[i:i+n-1], ' ')).
    """
    toks = tokens_expr(text)
    if n == 1:
        return toks
    count = F.size(toks) - (n - 1)
    # sequence(1, 0) DESCENDS in Spark — clamp the stop to ≥1 and gate
    # short docs to an empty array instead
    idx = F.sequence(F.lit(1), F.greatest(count, F.lit(1)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.when(count >= 1, grams).otherwise(
        F.array().cast("array<string>"))


def ngram_topk(docs: DataFrame, n: int = 2, k: int = 50,
               text_col: str = "text") -> DataFrame:
    """Corpus-wide top-``k`` word ``n``-grams by occurrence count.

    Deterministic total order: count DESC, gram ASC — ties can never
    reorder across engines or runs. Returns (gram, n_occurrences).

    Plan: the explode feeds one hash aggregate (partial counts combine
    map-side, so the shuffle carries one row per distinct gram per
    partition), and orderBy+limit compiles to TakeOrdered — each
    partition ships only its k best rows to the driver-side merge.
    """
    grams = docs.select(
        F.explode(ngrams_expr(F.col(text_col), n)).alias("gram"))
    counts = grams.groupBy("gram").agg(F.count("*").alias("n_occurrences"))
    return counts.orderBy(F.col("n_occurrences").desc(),
                          F.col("gram").asc()).limit(k)


def bm25_score(docs: DataFrame, query_terms: list[str],
               k1: float = 1.2, b: float = 0.75,
               text_col: str = "text", id_col: str = "doc_id",
               ln_scale: int | None = None) -> DataFrame:
    """Okapi BM25 score of every document against a literal query.

    score(d) = Σ_{t∈q} idf(t) · tf(t,d)·(k1+1) / (tf(t,d) +
               k1·(1 − b + b·dl(d)/avgdl))
    with idf(t) = ln((N − df(t) + 0.5) / (df(t) + 0.5) + 1)  (the
    non-negative Lucene form). Documents matching no query term score
    0 and are still returned (curation pipelines keep the full corpus
    with a score column; filtering is the caller's policy).

    Returns (id_col, n_tokens, bm25).

    ``ln_scale`` arms the engine-portable mode (same discipline as
    quality.unigram_logprob): each (doc, term)'s score term is
    floor-scaled to int64 once, the per-document sum runs in long
    arithmetic (order-independent — float SUM would drift with
    partial-agg order), and bm25 = Σ/ln_scale.

    Scale shape: tf rows are filtered to the |q| query terms BEFORE
    the df aggregate and the scoring join, so the shuffled frame is
    ≤|q| rows per document; N and avgdl ride in as a broadcast 1-row
    frame; df per term is a broadcast |q|-row frame.
    """
    if not query_terms:
        raise ValueError("bm25_score needs at least one query term")
    terms = sorted({t.lower() for t in query_terms})

    toks = docs.select(F.col(id_col),
                       F.explode(tokens_expr(F.col(text_col))).alias("tok"))
    # per-doc length: one combinable count agg over the exploded rows
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    totals = dl.agg(F.count("*").alias("n_docs"),
                    F.sum("dl").alias("total_tokens"))

    qtf = (toks.where(F.col("tok").isin(terms))
           .groupBy(id_col, "tok").agg(F.count("*").alias("tf")))
    # qtf is already one row per (doc, term) — a plain combinable
    # count IS the document frequency (no distinct agg needed)
    df_t = qtf.groupBy("tok").agg(F.count("*").alias("df"))

    # avgdl as the exact expression total/N in BOTH engines (one
    # double division — not a pre-rounded constant)
    avgdl = F.col("total_tokens").cast("double") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5)) + F.lit(1.0))
    tf_norm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl))
    term_score = idf * tf_norm
    if ln_scale is not None:
        term_score = F.floor(term_score * F.lit(ln_scale))

    scored = (qtf.join(F.broadcast(df_t), "tok")
              .join(dl, id_col)
              .crossJoin(F.broadcast(totals))
              .groupBy(id_col)
              .agg(F.sum(term_score).alias("s")))
    out = (dl.join(scored, id_col, "left")
           .select(id_col, F.col("dl").alias("n_tokens"),
                   F.coalesce(
                       F.col("s").cast("double") / F.lit(ln_scale or 1),
                       F.lit(0.0)).alias("bm25")))
    return out


def stratified_sample(docs: DataFrame, n_per_group: int,
                      group_col: str = "source",
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic fixed-size sample per group: the ``n_per_group``
    rows with the smallest md5(id) per ``group_col`` value.

    Hash-ranking makes the draw (a) uniform in expectation, (b) exactly
    reproducible across engines/runs/cluster sizes (no RNG state), and
    (c) STABLE UNDER CORPUS GROWTH in the reservoir sense: a document's
    rank key never changes, so adding documents can only displace the
    largest-keyed members of a group's sample — the property audit
    pipelines need when corpora are re-snapshotted.

    Returns the sampled rows plus their ``sample_rank`` (1-based).
    One window per group; skew bounded by group cardinality. For
    groups hotter than an executor (≈10^9+ rows at 100 TB), pre-filter
    with a hash-prefix gate (md5 < threshold) so the window input is
    already ≈n_per_group·ε rows — the rank key's stability makes the
    two-phase version exact.
    """
    key = F.md5(F.col(id_col).cast("string"))
    rank = F.row_number().over(
        Window.partitionBy(group_col).orderBy(key.asc(),
                                              F.col(id_col).asc()))
    return (docs.withColumn("sample_rank", rank)
            .where(F.col("sample_rank") <= n_per_group))


def rrf_fuse(rankings: list[DataFrame], k: int = 60,
             id_col: str = "doc_id", rank_col: str = "rank",
             scale: int = 10 ** 12) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009): fuse N ranked
    lists by score(d) = Σ_lists 1/(k + rank_l(d)) — the standard way
    hybrid retrieval combines BM25 and embedding rankings without
    score calibration (only RANKS cross systems, never raw scores).

    Each term is floor(scale / (k + rank)) in int64 — exact,
    order-independent summation (the repo's cross-engine discipline;
    a float Σ1/(k+r) would drift with partial-agg order). Returns
    (id_col, rrf_scaled, n_lists); callers order by
    (rrf_scaled desc, id) — ties are resolved deterministically.

    Scale shape: rankings are top-k tables (bounded — k rows per
    query per system), so this is a union + ONE combinable groupBy
    sum on the id key; no text, no windows, broadcast-sized inputs.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    if k <= 0:
        raise ValueError("k must be positive")
    parts = [
        r.select(F.col(id_col),
                 F.floor(F.lit(scale)
                         / (F.lit(k) + F.col(rank_col).cast("long")))
                 .cast("long").alias("_term"))
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (u.groupBy(id_col)
            .agg(F.sum("_term").alias("rrf_scaled"),
                 F.count("*").alias("n_lists")))


def recall_at_k(approx: DataFrame, exact: DataFrame,
                query_col: str = "query_id",
                id_col: str = "id") -> DataFrame:
    """ANN quality evaluation: per-query recall of an approximate
    top-k table against the exact (brute-force) top-k — the metric
    every IVF/LSH/PQ parameter sweep optimises (nprobe, bands,
    code size vs recall). Returns (query_col, n_exact, n_hits,
    recall_ppm) with recall_ppm = floor(1e6·hits/n_exact) computed by
    int64 DIV — no float crosses engines (repo discipline).

    Queries present only in ``exact`` report 0 hits; duplicate ids in
    ``approx`` can't double-count (the membership probe is a
    LEFT SEMI join, which never multiplies left rows).

    Scale shape: one (query, id)-keyed semi join + one combinable
    count per side on the query grain — fixed-width keys only, no
    payloads, no windows, no Python. Top-k tables are bounded (k rows
    per query), so even 10^9 queries shuffle ≈ k·|queries| keys.
    """
    e = exact.select(query_col, id_col)
    hits = (e.join(approx.select(query_col, id_col),
                   [query_col, id_col], "left_semi")
            .groupBy(query_col)
            .agg(F.count("*").cast("long").alias("n_hits")))
    base = (e.groupBy(query_col)
            .agg(F.count("*").cast("long").alias("n_exact")))
    return (base.join(hits, query_col, "left")
            .select(F.col(query_col), F.col("n_exact"),
                    F.coalesce(F.col("n_hits"), F.lit(0))
                    .cast("long").alias("n_hits"))
            .withColumn("recall_ppm",
                        F.expr("CAST((n_hits * 1000000) DIV n_exact"
                               " AS BIGINT)")))


def ndcg_at_k(ranked: DataFrame, rels: DataFrame, k: int = 10,
              query_col: str = "query_id", id_col: str = "id",
              rank_col: str = "rank", rel_col: str = "rel",
              scale: int = 10 ** 9) -> DataFrame:
    """Per-query nDCG@k — the rank-AWARE companion to recall_at_k
    (recall says whether the right ids surfaced; nDCG says whether
    they surfaced in the right ORDER, weighted by graded relevance).

    ``ranked``: (query, id, rank 1..) — the system under evaluation.
    ``rels``: (query, id, integer relevance ≥ 0) — the judgments.

        DCG  = Σ_{rank<=k} floor(scale·rel / log2(rank+1))
        IDCG = the same terms over the ideal (rel desc) ordering of
               the query's judged ids, truncated at k
        ndcg_ppm = DCG·1e6 DIV IDCG   (0 when IDCG = 0)

    Each discount term is the ONE float op (log2 of a small integer),
    floored to int64 immediately; sums and the final ratio are exact
    long arithmetic — the rrf_fuse/recall_at_k discipline, so engines
    can't drift on summation order. Unjudged ranked ids contribute 0.

    Like recall_at_k, the output keys off the JUDGMENTS side: a query
    present in ``ranked`` but absent from ``rels`` has no IDCG (nDCG
    is undefined) and is dropped from the result — filter such
    queries upstream, or join the output back to ranked's query set
    if their absence must be visible.

    Scale shape: one (query, id) equi-join of two bounded top-k
    tables, one window over the judgments (per-query, ≤ judged ids),
    two combinable sums on the query grain. No Python, no text."""
    term = lambda rel, rank: F.floor(  # noqa: E731
        F.lit(scale) * rel.cast("double")
        / F.log2(rank.cast("double") + F.lit(1.0))).cast("long")

    r = (ranked.where(F.col(rank_col) <= k)
         .join(rels.select(query_col, id_col, rel_col),
               [query_col, id_col], "left")
         .select(F.col(query_col),
                 term(F.coalesce(F.col(rel_col), F.lit(0)),
                      F.col(rank_col)).alias("_t")))
    dcg = r.groupBy(query_col).agg(F.sum("_t").alias("dcg_scaled"))

    iw = Window.partitionBy(query_col).orderBy(
        F.col(rel_col).desc(), F.col(id_col).asc())
    ideal = (rels.withColumn("_ir", F.row_number().over(iw))
             .where(F.col("_ir") <= k)
             .select(F.col(query_col),
                     term(F.col(rel_col), F.col("_ir")).alias("_t")))
    idcg = ideal.groupBy(query_col).agg(
        F.sum("_t").alias("idcg_scaled"))

    return (idcg.join(dcg, query_col, "left")
            .select(F.col(query_col),
                    F.coalesce("dcg_scaled", F.lit(0)).cast("long")
                    .alias("dcg_scaled"),
                    F.col("idcg_scaled").cast("long")
                    .alias("idcg_scaled"))
            .withColumn(
                "ndcg_ppm",
                F.when(F.col("idcg_scaled") > 0,
                       F.expr("CAST((dcg_scaled * 1000000) DIV"
                              " idcg_scaled AS BIGINT)"))
                .otherwise(F.lit(0).cast("long"))))
