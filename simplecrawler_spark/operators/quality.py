"""Corpus-level quality scoring: unigram LM log-probability.

CCNet-style quality filtering ranks documents by the log-probability a
language model trained on the corpus (or a trusted reference corpus)
assigns them; low-probability docs are gibberish/boilerplate
candidates. The reference crawler has no analogue (it gates on HTTP
status/MIME only) — this is training-data-pipeline machinery over the
`documents` table, same family as functions/text.py's per-row
heuristics but CORPUS-trained: the model is an aggregate of the very
DataFrame being scored (or of a separate reference DataFrame).

Scale shape (the whole point at 100 TB):
  * tokens are counted per (doc, token) FIRST — the explode feeds a
    map-side-combinable groupBy, so the join below carries one row per
    distinct (doc, token), not one per token instance;
  * the vocabulary (token → corpus count) is a second
    map-side-combinable agg off those TF rows — no second pass over
    the text;
  * scoring joins TF rows to the vocab on `token`. Hot stopword
    tokens are exactly the keys AQE's skew-join splits; with a
    bounded vocab the optimizer broadcasts it outright;
  * the corpus totals (N tokens, V vocab size) ride in via a
    broadcast 1-row cross join — never a driver collect.

Everything is built-in expressions (explode / groupBy / join / ln) —
no Python UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simplecrawler_spark.functions.text import _bigrams_expr, tokens_expr

__all__ = ["unigram_logprob", "bigram_logprob", "quality_buckets",
           "readability_scores", "source_diversity",
           "strip_boilerplate",
           "hashed_linear_score",
           "corpus_stats", "corpus_pipeline_flags",
           "gopher_rules", "gopher_repetition", "c4_line_rules",
           "GOPHER_STOPWORDS"]


def unigram_logprob(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", alpha: float = 1.0,
                    model_docs: DataFrame | None = None,
                    ln_scale: int | None = None) -> DataFrame:
    """Per-document mean unigram log-probability under an
    additive-smoothed unigram LM estimated from ``model_docs``
    (default: the scored corpus itself).

    For a doc with tokens t_1..t_n:
        score = (1/n) * Σ_i ln( (c(t_i) + α) / (N + α·V) )
    where c(t) is the model corpus count of t, N total model tokens,
    V distinct model tokens. Unknown tokens (when ``model_docs`` is a
    separate reference corpus) get the α-smoothed floor. Docs with no
    tokens are omitted (no defined probability).

    Returns (id_col, n_tokens, logprob).

    ``ln_scale`` arms the ENGINE-PORTABLE mode: each distinct token's
    ln(c+α) is floor-scaled to int64 once, the per-document sum runs
    in long arithmetic (order-independent — a cross-engine float SUM
    would drift with partial-agg order), and the final value is the
    deterministic composition (Σtf·lnₛ/n − lnₛ_total)/ln_scale of
    IEEE ops on identical longs. Use it whenever scores are compared
    across engines/runs (the q_unigram_logprob oracle twin); leave
    None for full float precision.
    """
    toks = docs.select(F.col(id_col),
                       F.explode(tokens_expr(F.col(text_col)))
                       .alias("tok"))
    tf = toks.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))

    if model_docs is None:
        model_tf = tf
    else:
        model_tf = (model_docs.select(
            F.explode(tokens_expr(F.col(text_col))).alias("tok"))
            .groupBy("tok").agg(F.count("*").alias("tf")))
    vocab = model_tf.groupBy("tok").agg(F.sum("tf").alias("cnt"))
    totals = vocab.agg(F.sum("cnt").alias("n_total"),
                       F.count("*").alias("v_size"))

    ln_c = F.log(F.coalesce(F.col("cnt"), F.lit(0)).cast("double")
                 + F.lit(alpha))
    ln_tot = F.log(F.col("n_total").cast("double")
                   + F.lit(alpha) * F.col("v_size"))
    if ln_scale is not None:
        ln_c = F.floor(ln_c * F.lit(ln_scale))
        ln_tot = F.floor(ln_tot * F.lit(ln_scale))
    scored = (
        tf.join(vocab, "tok", "left")  # left: unknown tokens → floor
        .select(id_col, "tf", ln_c.alias("ln_c"))
        .groupBy(id_col)
        .agg(F.sum("tf").alias("n_tokens"),
             F.sum(F.col("tf") * F.col("ln_c")).alias("sum_ln"))
        .crossJoin(F.broadcast(totals))
        .select(
            id_col, "n_tokens",
            (F.col("sum_ln") / F.col("n_tokens") - ln_tot).alias("logprob"))
    )
    if ln_scale is not None:
        scored = scored.withColumn(
            "logprob", F.col("logprob") / F.lit(ln_scale))
    return scored


def bigram_logprob(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", alpha: float = 1.0,
                   lam: float = 0.75,
                   model_docs: DataFrame | None = None,
                   ln_scale: int | None = None) -> DataFrame:
    """Per-document mean INTERPOLATED-BIGRAM log-probability — the
    KenLM-style perplexity filter one order above unigram_logprob
    (CCNet scores with a 5-gram KenLM; the distributed
    estimate-then-score shape is identical at any order, and order 2
    keeps the cross-engine oracle exact):

        P(w|v) = λ·(c2(v,w)+α)/(c1(v)+α·V)
               + (1−λ)·(c1(w)+α)/(N+α·V)
        score  = (1/m)·Σ ln P(w_i|w_{i-1}) over the doc's m bigrams

    ``model_docs`` defaults to the scored corpus; unknown
    bigrams/tokens fall to the α-smoothed floors. Docs with < 2
    tokens are omitted (no bigram probability is defined). Returns
    (id_col, n_bigrams, logprob).

    ``ln_scale`` arms the portable mode (unigram_logprob
    discipline): ln P is computed once per joined row as an IEEE
    double with a PINNED expression shape — the oracle writes the
    same parenthesisation, so both engines hit identical doubles —
    then floor-scaled to int64, and the per-doc sum runs in long
    arithmetic (order-independent across partial aggs).

    Scale shape: model counts are two map-side-combinable aggs on
    token keys; scoring is three equi-joins on fixed-width token
    strings (bigram, prev token, cur token) + one combinable per-doc
    sum; the (N, V) totals ride in as a broadcast single row. No
    Python, no windows, no text past tokenisation.
    """
    bg = _bigrams_expr(tokens_expr(F.col(text_col)))
    doc_bg = docs.select(F.col(id_col), F.explode(bg).alias("bg"))
    tf = doc_bg.groupBy(id_col, "bg").agg(F.count("*").alias("tf"))

    model = docs if model_docs is None else model_docs
    m_toks = model.select(
        F.explode(tokens_expr(F.col(text_col))).alias("tok"))
    c1 = m_toks.groupBy("tok").agg(F.count("*").alias("c1"))
    m_bg = model.select(F.explode(
        _bigrams_expr(tokens_expr(F.col(text_col)))).alias("bg"))
    c2 = m_bg.groupBy("bg").agg(F.count("*").alias("c2"))
    totals = c1.agg(F.sum("c1").cast("double").alias("n_total"),
                    F.count("*").cast("double").alias("v_size"))

    prev = F.split(F.col("bg"), " ")[0]
    cur = F.split(F.col("bg"), " ")[1]
    joined = (
        tf.join(c2, "bg", "left")
        .select(id_col, "bg", "tf",
                F.coalesce("c2", F.lit(0)).cast("double").alias("c2d"),
                prev.alias("_prev"), cur.alias("_cur"))
        .join(c1.select(F.col("tok").alias("_prev"),
                        F.col("c1").alias("c1p")), "_prev", "left")
        .join(c1.select(F.col("tok").alias("_cur"),
                        F.col("c1").alias("c1c")), "_cur", "left")
        .crossJoin(F.broadcast(totals)))
    c1p = F.coalesce("c1p", F.lit(0)).cast("double")
    c1c = F.coalesce("c1c", F.lit(0)).cast("double")
    # pinned shape: lam*(c2+α)/(c1p+α·V) + (1-lam)*(c1c+α)/(N+α·V)
    # — left-associative mul-then-div in BOTH engines
    p = (F.lit(lam) * (F.col("c2d") + F.lit(alpha))
         / (c1p + F.lit(alpha) * F.col("v_size"))
         + F.lit(1.0 - lam) * (c1c + F.lit(alpha))
         / (F.col("n_total") + F.lit(alpha) * F.col("v_size")))
    ln_p = F.log(p)
    if ln_scale is not None:
        ln_p = F.floor(ln_p * F.lit(ln_scale))
    out = (joined.select(id_col, "tf", ln_p.alias("ln_p"))
           .groupBy(id_col)
           .agg(F.sum("tf").alias("n_bigrams"),
                F.sum(F.col("tf") * F.col("ln_p")).alias("sum_ln"))
           .select(id_col, "n_bigrams",
                   (F.col("sum_ln") / F.col("n_bigrams"))
                   .alias("logprob")))
    if ln_scale is not None:
        out = out.withColumn("logprob",
                             F.col("logprob") / F.lit(ln_scale))
    return out


def quality_buckets(docs: DataFrame, n_buckets: int = 3,
                    group_col: str = "source", text_col: str = "text",
                    id_col: str = "doc_id", alpha: float = 1.0,
                    model_docs: DataFrame | None = None,
                    ln_scale: int = 10 ** 9,
                    quant: int = 1000) -> DataFrame:
    """CCNet-style quality bucketing: per ``group_col`` (language /
    source in CCNet), split documents into ``n_buckets`` equal-mass
    bands of unigram-LM quality — bucket 0 = head (highest logprob /
    lowest perplexity), n_buckets-1 = tail. Returns
    (id_col, group_col, n_tokens, logprob, bucket).

    Bucketing is SCORE-GRAIN, not row-grain: logprob is quantised to
    1/``quant`` nats and every doc sharing a quantised score lands in
    the same bucket (a boundary score's docs all take the earlier
    band). That is deliberately NOT ntile():
      * ntile is row-grain — it needs a total sort of every row within
        each group, and group cardinality is tiny (languages/sources),
        so at 10^10 docs each group's full sort funnels through few
        tasks;
      * here the window runs over the per-group HISTOGRAM of quantised
        scores — bounded by score range × quant (thousands of rows per
        group, independent of corpus size) — fed by a map-side-
        combinable count agg, and assignment is a join back on
        (group, q) that AQE broadcasts;
      * row-grain tie-splitting across engines/runs would also be
        nondeterministic; score-grain is exact and portable (the
        q_quality_buckets oracle).

    ``ln_scale`` stays armed by default: bucket boundaries compare
    floats, so scores must be the deterministic long-arithmetic
    composition (see unigram_logprob).
    """
    from pyspark.sql import Window

    scored = unigram_logprob(docs, text_col, id_col, alpha,
                             model_docs, ln_scale)
    d = (scored.join(docs.select(id_col, group_col), id_col)
         .select(id_col, group_col, "n_tokens", "logprob",
                 F.floor(F.col("logprob") * F.lit(quant))
                 .cast("long").alias("_q")))
    hist = d.groupBy(group_col, "_q").agg(F.count("*").alias("_cnt"))
    w_cum = Window.partitionBy(group_col).orderBy(F.desc("_q"))
    w_all = Window.partitionBy(group_col)
    buckets = hist.select(
        group_col, "_q",
        F.floor(F.lit(float(n_buckets))
                * (F.sum("_cnt").over(w_cum) - F.col("_cnt"))
                / F.sum("_cnt").over(w_all)).cast("int").alias("bucket"))
    return (d.join(buckets, [group_col, "_q"])
            .select(id_col, group_col, "n_tokens", "logprob", "bucket"))


def strip_boilerplate(docs: DataFrame, text_col: str = "text",
                      group_col: str = "source", id_col: str = "doc_id",
                      min_docs: int = 3, min_line_chars: int = 6,
                      broadcast_sets: bool = True) -> DataFrame:
    """CCNet-style line-level boilerplate removal: a line that recurs
    (trim-normalised) in >= ``min_docs`` DISTINCT documents of the
    same ``group_col`` (host/source) is template chrome — nav bars,
    cookie banners, subscribe footers — not content; strip it from
    every document of the group and reassemble the text in original
    line order. Lines shorter than ``min_line_chars`` are exempt
    (too little signal to call boilerplate).

    Returns (id_col, group_col, n_lines, n_stripped, text_clean).

    Scale shape: document TEXT never shuffles — the frequency pass
    explodes to (group, md5(line), doc) and aggregates on the 32-hex
    hash (map-side-combinable count-distinct grain), and the strip
    pass joins each group's BOILERPLATE HASH SET (bounded: only
    lines crossing the min_docs threshold) back onto the docs by
    group key — broadcast by default (``broadcast_sets``; a group's
    chrome vocabulary is tiny next to its corpus), plain hash join
    otherwise — then filters the doc's own line array with a JVM
    lambda (md5-in-filter, whole-stage codegen). Two shuffles of
    skinny hash rows total, zero Python, no text movement.
    """
    trimmed = lambda x: F.trim(x)  # noqa: E731 — shared shape
    lines = F.split(F.col(text_col), "\n")

    keyed = (docs.select(F.col(group_col), F.col(id_col),
                         F.explode(lines).alias("_line"))
             .where(F.length(F.trim(F.col("_line"))) >= min_line_chars)
             .select(group_col, id_col,
                     F.md5(F.trim(F.col("_line"))).alias("_lh")))
    bp = (keyed.groupBy(group_col, "_lh")
          .agg(F.countDistinct(id_col).alias("_nd"))
          .where(F.col("_nd") >= min_docs))
    bp_sets = (bp.groupBy(group_col)
               .agg(F.array_sort(F.collect_set("_lh")).alias("_bl")))
    if broadcast_sets:
        bp_sets = F.broadcast(bp_sets)

    joined = docs.join(bp_sets, group_col, "left")
    kept = F.when(
        F.col("_bl").isNull(), lines
    ).otherwise(F.filter(
        lines,
        lambda x: (F.length(trimmed(x)) < min_line_chars)
        | ~F.array_contains(F.col("_bl"), F.md5(trimmed(x)))))
    return joined.select(
        F.col(id_col), F.col(group_col),
        F.size(lines).cast("long").alias("n_lines"),
        (F.size(lines) - F.size(kept)).cast("long").alias("n_stripped"),
        F.array_join(kept, "\n").alias("text_clean"),
    )


# the Gopher paper's stopword-presence list (Rae et al. 2021, §A1.1:
# a doc must contain >= 2 of these to pass the rule)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                    "with")


def gopher_rules(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", min_words: int = 50,
                 max_words: int = 100_000) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021 — the repetition rules
    live in functions/text.py repetition_keep_expr; these are the
    remaining document-shape rules). Per-doc boolean flags plus the
    composite ``keep``:

      words_ok     — whitespace-word count in [min_words, max_words]
      wordlen_ok   — mean word length in [3, 10]
      symbol_ok    — ('#' + '...') occurrences <= 10% of words
      bullet_ok    — <= 90% of lines start with a bullet
      ellipsis_ok  — <= 30% of lines end with '...'
      alpha_ok     — >= 80% of words contain an alphabetic char
      stopword_ok  — >= 2 distinct GOPHER_STOPWORDS present

    EVERY ratio is compared in EXACT int64 cross-multiplication
    (10*n_sym <= n_words, 5*n_alpha >= 4*n_words, ...) — the repo's
    cross-engine discipline: no float ratio can flip a flag between
    Spark and the oracle. One narrow pure-JVM projection: no
    shuffle, no Python, codegen — gate-at-scan-grain like
    clean_corpus."""
    text = F.col(text_col)
    words = F.filter(F.split(text, r"\s+"), lambda w: w != F.lit(""))
    n_words = F.size(words).cast("long")
    total_chars = F.aggregate(
        F.transform(words, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    n_alpha = F.size(F.filter(
        words, lambda w: w.rlike("[a-zA-Z]"))).cast("long")
    n_hash = (F.length(text)
              - F.length(F.replace(text, F.lit("#")))).cast("long")
    n_dots = ((F.length(text)
               - F.length(F.replace(text, F.lit("..."))))
              / F.lit(3)).cast("long")
    lines = F.split(text, "\n")
    n_lines = F.size(lines).cast("long")
    # NB: not F.transform(lines, F.trim) — trim has an optional 2nd
    # parameter, so transform would pass the element INDEX to it and
    # silently skip trimming
    trimmed = F.transform(lines, lambda u: F.trim(u))
    n_bullet = F.size(F.filter(
        trimmed, lambda l: l.startswith("- ") | l.startswith("* ")
        | l.startswith("•"))).cast("long")
    n_ell_end = F.size(F.filter(
        trimmed, lambda l: l.endswith("..."))).cast("long")
    low_words = F.transform(words, F.lower)
    n_stop = sum(
        (F.array_contains(low_words, s).cast("long")
         for s in GOPHER_STOPWORDS), start=F.lit(0).cast("long"))

    words_ok = (n_words >= min_words) & (n_words <= max_words)
    wordlen_ok = ((total_chars >= 3 * n_words)
                  & (total_chars <= 10 * n_words))
    symbol_ok = (10 * (n_hash + n_dots)) <= n_words
    bullet_ok = (10 * n_bullet) <= (9 * n_lines)
    ellipsis_ok = (10 * n_ell_end) <= (3 * n_lines)
    alpha_ok = (5 * n_alpha) >= (4 * n_words)
    stopword_ok = n_stop >= 2
    keep = (words_ok & wordlen_ok & symbol_ok & bullet_ok
            & ellipsis_ok & alpha_ok & stopword_ok)
    return docs.select(
        F.col(id_col), n_words.alias("n_words"),
        words_ok.alias("words_ok"), wordlen_ok.alias("wordlen_ok"),
        symbol_ok.alias("symbol_ok"), bullet_ok.alias("bullet_ok"),
        ellipsis_ok.alias("ellipsis_ok"), alpha_ok.alias("alpha_ok"),
        stopword_ok.alias("stopword_ok"), keep.alias("keep"))


def gopher_repetition(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      max_dup: tuple[int, int] = (3, 10),
                      max_dup_chars: tuple[int, int] = (1, 5)) -> DataFrame:
    """Gopher repetition rules (Rae et al. 2021 Table A1 — the
    line/paragraph half; the n-gram half is functions/text.py
    repetition_keep_expr): per-doc duplicate-LINE and
    duplicate-PARAGRAPH fractions, by count and by characters.

      line_dup_ok  — duplicate lines      <= 30% of lines
      line_char_ok — chars in dup lines   <= 20% of line chars
      para_dup_ok  — duplicate paragraphs <= 30% of paragraphs
      para_char_ok — chars in dup paras   <= 20% of para chars
      keep         — all four

    'Duplicate' = every occurrence beyond the first of an identical
    trimmed unit (lines split on newline, paragraphs on blank lines).
    Thresholds are rational (num, den) pairs and every flag is an
    exact int64 cross-multiplication (den*dup <= num*n) — the repo's
    cross-engine discipline. Dup counting is per-row: sort the unit
    array, then count/measure items equal to their predecessor via a
    struct-accumulator fold — no shuffle, no Python, whole-stage
    codegen, a gate at scan grain like gopher_rules. (Reference scope
    note: the reference crawler has no corpus filters — this family
    is the training-pipeline surface SURVEY §6 mandates.)"""
    dn, dd = max_dup
    cn, cd = max_dup_chars

    def dup_stats(units):
        s = F.array_sort(units)
        n = F.size(s).cast("long")
        chars = F.aggregate(s, F.lit(0).cast("long"),
                            lambda a, x: a + F.length(x))
        # units are non-empty strings, so prev='' never matches the
        # first element
        acc0 = F.struct(F.lit("").alias("prev"),
                        F.lit(0).cast("long").alias("dup"),
                        F.lit(0).cast("long").alias("dchars"))
        z = F.aggregate(s, acc0, lambda a, x: F.struct(
            x.alias("prev"),
            (a["dup"] + F.when(x == a["prev"], F.lit(1).cast("long"))
             .otherwise(F.lit(0).cast("long"))).alias("dup"),
            (a["dchars"] + F.when(x == a["prev"],
                                  F.length(x).cast("long"))
             .otherwise(F.lit(0).cast("long"))).alias("dchars")))
        return n, z["dup"], chars, z["dchars"]

    text = F.col(text_col)
    units = lambda pat: F.filter(  # noqa: E731
        F.transform(F.split(text, pat), lambda u: F.trim(u)),
        lambda u: u != F.lit(""))
    ln, ldup, lchars, ldchars = dup_stats(units("\n"))
    pn, pdup, pchars, pdchars = dup_stats(units("\n{2,}"))

    line_dup_ok = dd * ldup <= dn * ln
    line_char_ok = cd * ldchars <= cn * lchars
    para_dup_ok = dd * pdup <= dn * pn
    para_char_ok = cd * pdchars <= cn * pchars
    keep = line_dup_ok & line_char_ok & para_dup_ok & para_char_ok
    return docs.select(
        F.col(id_col),
        ln.alias("n_lines"), ldup.alias("dup_lines"),
        lchars.alias("line_chars"), ldchars.alias("dup_line_chars"),
        pn.alias("n_paras"), pdup.alias("dup_paras"),
        pchars.alias("para_chars"), pdchars.alias("dup_para_chars"),
        line_dup_ok.alias("line_dup_ok"),
        line_char_ok.alias("line_char_ok"),
        para_dup_ok.alias("para_dup_ok"),
        para_char_ok.alias("para_char_ok"), keep.alias("keep"))


def c4_line_rules(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  min_line_words: int = 5) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020 §2.2), line grain then
    doc grain: keep only lines that end in terminal punctuation
    (. ! ? ") AND have >= ``min_line_words`` whitespace words AND
    don't mention javascript; drop the whole document if it contains
    '{' (code), 'lorem ipsum', or retains < 3 lines.

    Returns (id_col, n_lines, n_kept, has_brace, has_lorem, keep,
    text_clean) — text_clean is the kept lines re-joined in order.
    Pure per-row JVM array HOFs: no shuffle, no Python, no state —
    the cheapest possible shape, which is why C4-style line rules run
    FIRST in real pipelines, before anything that aggregates."""
    text = F.col(text_col)
    lines = F.split(text, "\n")
    ltrim = lambda l: F.trim(l)  # noqa: E731

    def line_ok(l):
        t = ltrim(l)
        n_w = F.size(F.filter(F.split(t, r"\s+"),
                              lambda w: w != F.lit("")))
        ends = (t.endswith(".") | t.endswith("!") | t.endswith("?")
                | t.endswith('"'))
        return (ends & (n_w >= min_line_words)
                & ~F.lower(t).contains("javascript"))

    kept = F.filter(lines, line_ok)
    n_kept = F.size(kept).cast("long")
    has_brace = text.contains("{")
    has_lorem = F.lower(text).contains("lorem ipsum")
    keep = ~has_brace & ~has_lorem & (n_kept >= 3)
    return docs.select(
        F.col(id_col), F.size(lines).cast("long").alias("n_lines"),
        n_kept.alias("n_kept"), has_brace.alias("has_brace"),
        has_lorem.alias("has_lorem"), keep.alias("keep"),
        F.array_join(kept, "\n").alias("text_clean"))


def readability_scores(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Flesch–Kincaid readability — the classic signal educational-
    value filters (FineWeb-edu style) combine with classifier scores:

        grade = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59

    Counting is EXACT integers in both engines: sentences = non-empty
    [.!?]-delimited segments (min 1), syllables = vowel-group runs
    ([aeiouy]+) per token with a 1-per-word floor (the standard
    heuristic — no dictionary). The grade itself is the one float:
    computed with a pinned expression shape and reported milli-scaled
    (floor(grade·1000)) so the oracle comparison stays integral.

    Returns (id_col, n_words, n_sentences, n_syllables, fk_milli).
    One narrow projection — per-row HOFs, no shuffle, no Python."""
    text = F.col(text_col)
    words = F.filter(F.split(text, r"\s+"), lambda w: w != F.lit(""))
    n_words = F.size(words).cast("long")
    sents = F.filter(F.transform(F.split(text, "[.!?]+"),
                                 lambda s: F.trim(s)),
                     lambda s: s != F.lit(""))
    n_sents = F.greatest(F.size(sents), F.lit(1)).cast("long")
    syll = F.aggregate(
        words, F.lit(0).cast("long"),
        lambda acc, w: acc + F.greatest(
            F.size(F.split(F.lower(w), "[aeiouy]+")) - 1, F.lit(1))
        .cast("long"))
    # pinned shape: 0.39*(w/s) + 11.8*(y/w) - 15.59, all doubles,
    # identical parenthesisation in the oracle
    grade = (F.lit(0.39) * (n_words.cast("double")
                            / n_sents.cast("double"))
             + F.lit(11.8) * (syll.cast("double")
                              / n_words.cast("double"))
             - F.lit(15.59))
    return docs.select(
        F.col(id_col), n_words.alias("n_words"),
        n_sents.alias("n_sentences"), syll.alias("n_syllables"),
        F.when(n_words > 0,
               F.floor(grade * F.lit(1000)).cast("long"))
        .otherwise(F.lit(None).cast("long")).alias("fk_milli"))


def corpus_stats(docs: DataFrame, group_col: str = "source",
                 text_col: str = "text", id_col: str = "doc_id",
                 lang: str = "en",
                 min_quality: float = 0.5) -> DataFrame:
    """Per-source dataset-card statistics — the mixture-planning
    table every corpus release ships (and what rebalance_mix /
    assemble_epochs take their targets from): document count, token
    and char volume, EXACT distinct normalised fingerprints (so
    n_docs - n_unique is the in-source exact-dup count), language
    hits, and quality-gate passes.

    Returns (group_col, n_docs, n_tokens, n_chars, n_unique,
    n_lang, n_quality).

    Scale shape: one pass over the text computes every per-row value
    in the scan projection; n_docs/n_tokens/n_chars/n_lang/n_quality
    partial-aggregate map-side on the source key, and the exact
    distinct rides the same shuffle as a (source, fingerprint)-grain
    pre-aggregate — 32-hex rows, never text. Output cardinality =
    number of sources."""
    from simplecrawler_spark.functions.text import (
        fingerprint_expr,
        lang_id_expr,
        quality_score_expr,
        token_count_expr,
    )

    text = F.col(text_col)
    base = docs.select(
        F.col(group_col),
        token_count_expr(text).cast("long").alias("_nt"),
        F.length(text).cast("long").alias("_nc"),
        fingerprint_expr(text).alias("_fp"),
        (lang_id_expr(text) == lang).cast("long").alias("_is_lang"),
        (quality_score_expr(text) >= min_quality).cast("long")
        .alias("_is_q"))
    return (base.groupBy(group_col)
            .agg(F.count("*").alias("n_docs"),
                 F.sum("_nt").alias("n_tokens"),
                 F.sum("_nc").alias("n_chars"),
                 F.countDistinct("_fp").alias("n_unique"),
                 F.sum("_is_lang").alias("n_lang"),
                 F.sum("_is_q").alias("n_quality")))


def source_diversity(docs: DataFrame, source_col: str = "source",
                     ln_scale: int = 10 ** 6) -> DataFrame:
    """Corpus-level mixture diversity — the dataset-card number next
    to corpus_stats' per-source rows: Shannon entropy of the source
    distribution and its exponential, the EFFECTIVE number of
    sources (a corpus 99% one domain has many sources but effective
    ≈ 1; mixture planning optimises this, temperature_weights moves
    it).

        H = ln N − (Σ n_s·ln n_s)/N        (nats)
        effective = exp(H)

    unigram_logprob discipline: one ln per source floor-scaled to
    int64, the Σ runs in long arithmetic, the division is integer
    DIV — H_scaled is exactly reproducible; exp is the one pinned-
    shape float, milli-floored. Returns one row
    (n_sources, n_docs, h_scaled, effective_milli).

    Scale shape: one combinable count per source, one tiny agg over
    source rows. int64 bound: the per-source term is
    n·floor(ln(n)·ln_scale), so the default ln_scale=1e6 is exact up
    to ~3×10^11 docs in a SINGLE source (n·ln(n) ≤ 9.2e12) — beyond
    the 1e9–1e10-doc corpus target with two orders of margin. Raising
    ln_scale back to 1e9 tightens entropy resolution but overflows
    once one source exceeds ~4×10^8 docs; effective_milli keeps
    milli precision at any scale ≥ ~1e4."""
    counts = (docs.groupBy(source_col)
              .agg(F.count("*").cast("long").alias("n")))
    term = (F.col("n")
            * F.floor(F.log(F.col("n").cast("double"))
                      * F.lit(ln_scale)).cast("long"))
    agg = counts.agg(
        F.count("*").cast("long").alias("n_sources"),
        F.sum("n").cast("long").alias("n_docs"),
        F.sum(term).cast("long").alias("_s"))
    h = (F.floor(F.log(F.col("n_docs").cast("double"))
                 * F.lit(ln_scale)).cast("long")
         - F.expr("CAST(_s DIV n_docs AS BIGINT)"))
    return agg.select(
        "n_sources", "n_docs", h.alias("h_scaled")).withColumn(
        "effective_milli",
        F.floor(F.exp(F.col("h_scaled").cast("double")
                      / F.lit(float(ln_scale))) * F.lit(1000))
        .cast("long"))


def hashed_linear_score(docs: DataFrame, weights: DataFrame,
                        n_buckets: int = 1 << 18,
                        text_col: str = "text",
                        id_col: str = "doc_id",
                        bucket_col: str = "bucket",
                        weight_col: str = "weight",
                        salt: str = "flt|",
                        broadcast_weights: bool = True) -> DataFrame:
    """FastText-style linear text-classifier INFERENCE — the
    quality / educational-value classifier pass of CCNet- and
    FineWeb-edu-style pipelines. Training happens offline (model
    fitting is out of engine scope, like the CLIP encoder); the
    engine's job is applying the model at corpus scale, and a linear
    model over hashed token features is exactly a join + sum:

      bucket(token) = md5-hash(salt|token) mod n_buckets  (hashing
      trick — OOV-free, engine-portable), dot = Σ_tokens
      weight[bucket], score_scaled = dot div n_tokens (weights are
      integer-scaled by the caller; everything stays exact int64 —
      Spark's div and DuckDB's // both truncate, pinned by the
      oracle).

    Returns (id_col, n_tokens, dot_scaled, score_scaled); docs with
    no tokens are omitted (no defined score).

    Scale shape: explode → map-side-combinable (doc, bucket) count →
    join the weight table on bucket (broadcast by default — a model
    is ≤ n_buckets rows; plain hash join for huge vocabularies) →
    one doc-grain combinable sum. Unknown buckets weigh 0 (left
    join). No Python anywhere.
    """
    from simplecrawler_spark.functions.text import (
        hash_long60, tokens_expr,
    )

    toks = docs.select(
        F.col(id_col),
        F.explode(tokens_expr(F.col(text_col))).alias("_tok"))
    tf = (toks.select(
        id_col,
        (hash_long60(F.col("_tok"), salt) % n_buckets).alias("_b"))
        .groupBy(id_col, "_b").agg(F.count("*").alias("_tf")))
    w = weights.select(
        F.col(bucket_col).cast("long").alias("_b"),
        F.col(weight_col).cast("long").alias("_w"))
    if broadcast_weights:
        w = F.broadcast(w)
    scored = (tf.join(w, "_b", "left")
              .groupBy(id_col)
              .agg(F.sum("_tf").alias("n_tokens"),
                   F.sum(F.col("_tf") * F.coalesce(F.col("_w"),
                                                   F.lit(0)))
                   .alias("dot_scaled")))
    return scored.select(
        id_col, "n_tokens", "dot_scaled",
        F.expr("dot_scaled div n_tokens").alias("score_scaled"))


def corpus_pipeline_flags(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", lang: str = "en",
                          min_quality: float = 0.5,
                          gopher_min_words: int = 10) -> DataFrame:
    """The full cleaning pipeline as ONE audit table — per document,
    every stage's verdict side by side (the FineWeb/Dolma-style
    ablation table: corpus builders tune stages by reading exactly
    this breakdown before committing to a drop):

      lang_ok     — language-ID gate (functions/text.lang_id_expr)
      quality_ok  — heuristic quality score >= min_quality
      gopher_ok   — gopher_rules composite (document shape)
      c4_ok       — c4_line_rules document verdict
      canonical   — exact-dedup survivor (min id per normalised
                    fingerprint)
      keep        — AND of all five

    Flags are computed on the RAW text independently (audit
    semantics — each stage's verdict is attributable), in one scan
    projection; the only shuffle is the fingerprint min-agg +
    join-back that `canonical` needs (32-hex + id rows). Zero
    Python. Composes the individually-oracled stages — q_pipeline
    twins the whole conjunction."""
    from simplecrawler_spark.functions.text import (
        fingerprint_expr,
        lang_id_expr,
        quality_score_expr,
    )

    text = F.col(text_col)
    flagged = docs.select(
        F.col(id_col), F.col(text_col),
        (lang_id_expr(text) == lang).alias("lang_ok"),
        (quality_score_expr(text) >= min_quality).alias("quality_ok"),
        fingerprint_expr(text).alias("_fp"))
    g = (gopher_rules(docs, text_col=text_col, id_col=id_col,
                      min_words=gopher_min_words)
         .select(F.col(id_col), F.col("keep").alias("gopher_ok")))
    c = (c4_line_rules(docs, text_col=text_col, id_col=id_col)
         .select(F.col(id_col), F.col("keep").alias("c4_ok")))
    canon = (flagged.groupBy("_fp")
             .agg(F.min(id_col).alias("_keep_id")))
    out = (flagged.join(g, id_col).join(c, id_col)
           .join(canon, "_fp")
           .select(
               F.col(id_col), "lang_ok", "quality_ok", "gopher_ok",
               "c4_ok",
               (F.col(id_col) == F.col("_keep_id")).alias("canonical")))
    return out.withColumn(
        "keep", F.col("lang_ok") & F.col("quality_ok")
        & F.col("gopher_ok") & F.col("c4_ok") & F.col("canonical"))
