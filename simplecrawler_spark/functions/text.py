"""Text-analysis functions for the training-data pipeline: token
counting, language-ID heuristic, quality scoring, fingerprinting, and
the portable 64-bit hash familiy shared with the DuckDB oracle.

These extend the engine beyond the reference (which has no text ops at
all — SURVEY.md §2.7); they're the document-pipeline surface a 100 TB
crawl corpus needs. Everything here is pure Spark expressions (JVM,
whole-stage codegen) — no Python in the hot path.

Portability contract: every function has an exact ANSI-SQL twin in
__spark_entry__.oracle_sql(); the shared primitives are md5 (identical
in Spark and DuckDB) and hex-prefix→int64 (Spark `conv(...,16,10)`,
DuckDB `('0x'||…)::BIGINT`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = "[^a-z0-9]+"

# tiny fixed English-marker list; includes the synthetic-corpus data
# vocabulary so the heuristic is non-degenerate on the test tables
EN_MARKERS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "on", "for",
    "with", "as", "at", "by", "it", "this", "that", "table", "row",
    "data", "query", "value", "key",
]


def tokens_expr(text: Column) -> Column:
    """Lowercased alnum tokens; empty strings filtered.
    Oracle twin: list_filter(regexp_split_to_array(lower(t), pat), x->x<>'')"""
    return F.filter(
        F.split(F.lower(text), TOKEN_PATTERN), lambda t: t != F.lit(""))


def token_count_expr(text: Column) -> Column:
    return F.size(tokens_expr(text))


def marker_ratio_expr(text: Column, markers: list[str] | None = None) -> Column:
    """fraction of tokens that are known-English markers."""
    markers = markers or EN_MARKERS
    toks = tokens_expr(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(markers)))
    return F.when(F.size(toks) > 0,
                  hits.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def lang_id_expr(text: Column, threshold: float = 0.15) -> Column:
    """n-gram-free language-ID heuristic: English iff the marker-token
    ratio clears the threshold. (A real system swaps in fastText etc.;
    the Spark plumbing — pure column expression — is the point.)"""
    return F.when(marker_ratio_expr(text) >= threshold,
                  F.lit("en")).otherwise(F.lit("other"))


def quality_score_expr(text: Column) -> Column:
    """Document quality in [0,1]: length band + alpha ratio + mean
    token length band (the usual cheap pretraining filters)."""
    n = F.length(text)
    toks = tokens_expr(text)
    n_tok = F.size(toks)
    alpha = F.length(F.regexp_replace(F.lower(text), "[^a-z]", ""))
    alpha_ratio = F.when(n > 0, alpha.cast("double") / n).otherwise(F.lit(0.0))
    mean_tok = F.when(n_tok > 0,
                      (F.aggregate(toks, F.lit(0).cast("long"),
                                   lambda acc, t: acc + F.length(t))
                       .cast("double") / n_tok)).otherwise(F.lit(0.0))
    len_band = F.when((n >= 100) & (n <= 10000), F.lit(1.0)) \
                .when(n >= 20, F.lit(0.5)).otherwise(F.lit(0.0))
    tok_band = F.when((mean_tok >= 3.0) & (mean_tok <= 12.0), F.lit(1.0)) \
                .otherwise(F.lit(0.3))
    return F.round((0.4 * len_band + 0.3 * alpha_ratio + 0.3 * tok_band), 6)


def normalized_text_expr(text: Column) -> Column:
    """Canonical text form for fingerprinting: lowercase, collapse all
    non-alnum runs to single spaces, trim."""
    return F.btrim(F.regexp_replace(F.lower(text), TOKEN_PATTERN, " "))


def fingerprint_expr(text: Column) -> Column:
    """128-bit content fingerprint of the normalised text."""
    return F.md5(normalized_text_expr(text))


# ---------------------------------------------------------------------------
# portable hash primitives (shared contract with the DuckDB oracle)
# ---------------------------------------------------------------------------

def hash_hex16(col: Column, salt: str = "") -> Column:
    """16-hex-digit (64-bit) hash as a STRING — lexicographic order ==
    numeric order, so min/max work across engines."""
    base = F.concat(F.lit(salt), col) if salt else col
    return F.substring(F.md5(base), 1, 16)


def hash_long60(col: Column, salt: str = "") -> Column:
    """60-bit non-negative int64 from the md5 prefix.
    Oracle twin: ('0x' || substr(md5(salt||x),1,15))::BIGINT"""
    base = F.concat(F.lit(salt), col) if salt else col
    return F.conv(F.substring(F.md5(base), 1, 15), 16, 10).cast("long")
