"""Byte-pair-encoding subword tokenizer: distributed vocabulary
statistics, bounded merge training, Arrow-batch encoding.

BPE (Sennrich et al. 2016; the GPT-2/LLaMA tokenizer family) learns a
merge table by repeatedly fusing the most frequent adjacent symbol
pair. The classic trainer never touches the raw corpus after one
pass: it operates on the WORD-FREQUENCY table, which is why the
operator splits the way real pipelines do —

* ``word_freqs`` — the only corpus-scale stage: one explode + one
  map-side-combinable groupBy over 100 TB of text, emitting a
  (word, freq) table bounded by the language's vocabulary (~10^6-10^7
  distinct words), not by corpus size.
* ``pair_counts`` — adjacent-symbol-pair statistics over that table
  (iteration-0 of training), pure JVM HOFs, oracle-twinned
  (q_bpe_pairs).
* ``bpe_train`` — the merge loop on the COLLECTED frequency table
  (capped at ``max_words`` rows — bounded driver state by
  construction, the same shape every production tokenizer trainer
  uses: distributed counts in, in-memory merge loop out). Ties break
  deterministically (count desc, pair lexicographic asc), so the
  merge table is reproducible across runs and cluster sizes.
* ``bpe_encode`` — greedy lowest-rank-first encoding as an
  Arrow-batch pandas UDF with per-word memoisation (web text repeats
  words constantly; each distinct word is encoded once per batch).

Training is iterative and dict-bound — not SQL-expressible — so the
loop is pytest-pinned (hand-derivable fixture + properties) while the
distributed statistics carry the full DuckDB oracle, the same
boundary as IVF k-means / PQ training (operators/similarity.py).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from simplecrawler_spark.functions.text import tokens_expr

__all__ = ["END_OF_WORD", "word_freqs", "pair_counts", "bpe_train",
           "bpe_encode"]

END_OF_WORD = "</w>"


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — explode + combinable count;
    the single stage whose cost scales with corpus size."""
    return (docs.select(F.explode(tokens_expr(F.col(text_col)))
                        .alias("word"))
            .groupBy("word").agg(F.count("*").alias("freq")))


def _symbols_expr(word):
    """Initial symbol sequence: characters + terminal end-of-word
    marker (the marker is what lets merges learn suffixes like
    'est</w>' distinct from mid-word 'est')."""
    chars = F.filter(F.split(word, "(?!^)"), lambda c: c != F.lit(""))
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def pair_counts(freqs: DataFrame) -> DataFrame:
    """Adjacent-pair statistics (a, b, pair_count) weighted by word
    frequency — what iteration 0 of the merge loop maximises. Pure
    JVM: per-word zip of the symbol array with its own tail, explode,
    one combinable sum keyed on the pair."""
    syms = _symbols_expr(F.col("word"))
    n = F.size(syms)
    pairs = F.zip_with(
        F.slice(syms, F.lit(1), n - 1), F.slice(syms, F.lit(2), n - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")))
    return (freqs.select(F.col("freq"), F.explode(pairs).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("pair_count")))


def _merge_word(syms: tuple, a: str, b: str) -> tuple:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train(docs: DataFrame, n_merges: int = 200,
              text_col: str = "text",
              max_words: int = 1_000_000) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Driver memory is
    bounded by ``max_words`` frequency rows (highest-frequency words
    first, word asc tie-break — deterministic truncation; the dropped
    long tail of hapax words contributes ~nothing to pair counts).
    Returns the merge list in rank order."""
    if n_merges <= 0:
        raise ValueError("n_merges must be positive")
    rows = (word_freqs(docs, text_col)
            .orderBy(F.col("freq").desc(), F.col("word").asc())
            .limit(max_words).collect())
    vocab = {tuple(r.word) + (END_OF_WORD,): r.freq for r in rows}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        # count desc, then lexicographically smallest pair: the same
        # deterministic tie-break as pair_counts consumers
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {_merge_word(s, *best): f for s, f in vocab.items()}
    return merges


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Encode each document with a trained merge table: greedy
    lowest-rank-first (exactly how GPT-2's encoder applies its
    vocab). Arrow-batch pandas UDF with per-word memoisation; output
    is (id_col, subwords array, n_subwords). At 100 TB this is a
    narrow map stage — no shuffle, parallel over whatever
    partitioning the corpus already has."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def encode_word(word: str, memo: dict) -> list[str]:
        got = memo.get(word)
        if got is not None:
            return got
        syms = list(word) + [END_OF_WORD]
        while len(syms) > 1:
            ranked = [(ranks[p], i) for i, p in
                      enumerate(zip(syms, syms[1:])) if p in ranks]
            if not ranked:
                break
            r, _ = min(ranked)
            a, b = merges[r]
            syms = list(_merge_word(tuple(syms), a, b))
        memo[word] = syms
        return syms

    from simplecrawler_spark.functions.text import TOKEN_PATTERN
    import re
    tok_re = re.compile(TOKEN_PATTERN)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def enc(texts: pd.Series) -> pd.Series:
        memo: dict = {}
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            subs: list[str] = []
            for w in tok_re.split(t.lower()):
                if w:
                    subs.extend(encode_word(w, memo))
            out.append(subs)
        return pd.Series(out)

    return docs.select(
        F.col(id_col), enc(F.col(text_col)).alias("subwords")
    ).withColumn("n_subwords", F.size("subwords").cast("long"))
