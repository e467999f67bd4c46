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
# repetition signals (Gopher-style quality filters; Rae et al. 2021)
# ---------------------------------------------------------------------------

def dup_token_frac_expr(text: Column) -> Column:
    """Fraction of tokens that are repeats of an earlier token:
    1 - distinct/total. The cheapest within-document repetition signal
    a pretraining filter uses (the line-level variant degenerates on
    single-line documents, so the token-level form is the portable
    one). Pure expressions — per-row cost bounded by document length,
    no shuffle."""
    toks = tokens_expr(text)
    n = F.size(toks)
    return F.when(
        n > 0,
        (n - F.size(F.array_distinct(toks))).cast("double") / n
    ).otherwise(F.lit(0.0))


def _bigrams_expr(toks: Column) -> Column:
    """Token 2-grams via slice+zip_with (no positional element_at, so
    ANSI mode can never raise on short documents)."""
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(F.slice(toks, 1, m), F.slice(toks, 2, m),
                      lambda a, b: F.concat(a, F.lit(" "), b))


def top_bigram_frac_expr(text: Column) -> Column:
    """Fraction of token 2-grams taken by the single most frequent
    2-gram (the Gopher top-2-gram filter), floored at zero when that
    2-gram occurs only once — a 2-gram seen once is not repetition,
    and without the floor every document shorter than 1/threshold
    bigrams trips the gate.

    Counting is O(d log d) per row: sort the 2-gram array, then one
    aggregate pass finds the longest run of equal neighbours (= the
    max count). The first version counted each distinct 2-gram with a
    nested filter — O(d·u), ~10 ms/doc on the testdata and quadratic
    on long documents; the sort+run-length form is the same value at
    a per-row cost that stays flat as documents grow. Embarrassingly
    parallel, nothing crosses rows."""
    bg = _bigrams_expr(tokens_expr(text))
    n_bg = F.size(bg)

    def step(acc, x):
        run = (F.when(x == acc.getField("prev"),
                      acc.getField("run") + 1).otherwise(F.lit(1)))
        return F.struct(x.alias("prev"), run.alias("run"),
                        F.greatest(acc.getField("best"), run).alias("best"))

    top = F.aggregate(
        F.array_sort(bg),
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                 F.lit(0).alias("best")),
        step,
    ).getField("best")
    return F.when((n_bg > 0) & (top >= 2),
                  top.cast("double") / n_bg).otherwise(F.lit(0.0))


def repetition_keep_expr(text: Column, max_dup: float = 0.3,
                         max_top_bigram: float = 0.2) -> Column:
    """Boolean keep-flag combining both repetition signals at the
    published Gopher thresholds (dup fraction ≤ 0.3, top-2-gram
    fraction ≤ 0.2)."""
    return (dup_token_frac_expr(text) <= max_dup) & \
        (top_bigram_frac_expr(text) <= max_top_bigram)


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


# ---------------------------------------------------------------------------
# deterministic corpus splitting (train/val/test assignment)
# ---------------------------------------------------------------------------

SPLIT_BUCKETS = 1_000_000


def split_assign_expr(key: Column, fractions: dict[str, float],
                      salt: str = "split|") -> Column:
    """Deterministic split label from a stable key: hash the key into
    one of SPLIT_BUCKETS buckets and assign by cumulative fraction
    ranges. The assignment is a pure per-row expression — reproducible
    across runs, engines, cluster sizes, and row order (what
    rand()-based sampling is NOT), shuffle-free, and stable under
    corpus growth: a document's split never changes when other
    documents are added, so eval contamination can't creep in between
    pipeline runs. Keys beyond the last cumulative fraction get NULL
    (dropped rows), so fractions may sum to < 1 for subsampling.
    """
    total = sum(fractions.values())
    if not 0 < total <= 1 + 1e-9:
        raise ValueError(f"fractions must sum to (0, 1], got {total}")
    bucket = hash_long60(key.cast("string"), salt) % SPLIT_BUCKETS
    expr = F.lit(None).cast("string")
    cum = 0.0
    conds = []
    for name, frac in fractions.items():
        cum += frac
        conds.append((int(round(cum * SPLIT_BUCKETS)), name))
    for bound, name in reversed(conds):
        expr = F.when(bucket < bound, F.lit(name)).otherwise(expr)
    return expr


# ---------------------------------------------------------------------------
# PII redaction (pre-training scrub: emails / phone numbers / IPv4)
# ---------------------------------------------------------------------------

# Patterns chosen to mean the same thing in Java regex (Spark) and
# RE2 (DuckDB): no backrefs, no lookaround, explicit classes only.
# The oracle twin uses these exact strings (q_redact_pii).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d{1,3}[- ]\d{3}[- ]\d{3,4}(?:[- ]\d{1,4})?\b"


def redact_pii_exprs(text: Column) -> dict[str, Column]:
    """PII scrub as pure per-row expressions — counts plus the
    redacted text. Order matters and is fixed: emails first (their
    local parts can contain digits a phone pattern would chew on),
    then IPv4 (dotted quads would otherwise half-match the phone
    rule), then phones. Replacement tokens contain no digits or '@',
    so later passes never re-match earlier redactions.

    Counts are taken on the ORIGINAL text for emails, then on each
    intermediate for ip/phone — i.e. they count what the redactor
    actually replaced, so `n_*` sums to the number of <TOKEN>s
    inserted. Everything is JVM regexp machinery (codegen); the
    pipeline-stage wrapper is one call:
    docs.withColumns(redact_pii_exprs(F.col("text"))).

    Returns {"n_emails", "n_ipv4", "n_phones", "text_redacted"}.
    """
    after_email = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, PII_IPV4, "<IP>")
    after_phone = F.regexp_replace(after_ip, PII_PHONE, "<PHONE>")
    return {
        "n_emails": F.regexp_count(text, F.lit(PII_EMAIL)).cast("long"),
        "n_ipv4": F.regexp_count(after_email,
                                 F.lit(PII_IPV4)).cast("long"),
        "n_phones": F.regexp_count(after_ip,
                                   F.lit(PII_PHONE)).cast("long"),
        "text_redacted": after_phone,
    }


def chunk_docs(df, text_col: str = "text", *, chunk_tokens: int = 64,
               stride: int | None = None,
               id_cols: tuple[str, ...] = ("doc_id",)):
    """Sliding-window training-chunk segmentation: explode each
    document into fixed-token-budget chunks (the step before
    operators/packing.py pack_sequences lays chunks into shards).

    Semantics (exact, both engines — q_chunk_docs twins it):
      * tokens = whitespace split of the raw text (empties dropped);
      * chunk starts at every ``stride`` tokens while start < n
        (``stride`` defaults to ``chunk_tokens`` — disjoint chunks;
        smaller stride = overlapping windows, the LLM-pretraining
        convention for long-document continuity);
      * each chunk is the next ``chunk_tokens`` tokens (the last one
        may be shorter, never empty); chunk_text re-joins tokens with
        single spaces (whitespace-normalising, documented);
      * empty/whitespace-only docs produce NO rows.

    Pure JVM expressions end to end: split + sequence + posexplode +
    slice + array_join — no Python, no shuffle (row-local explode);
    output order inside a doc is chunk_id. Output = ``id_cols`` +
    (chunk_id, start_tok, n_chunk_tokens, chunk_text).

    Scale shape: the explode multiplies rows by ~n/stride but every
    chunk is assembled from its own row's array — Catalyst keeps the
    whole thing in one WholeStageCodegen span over the scan, so
    chunking composes with filter pushdown and never materialises the
    token arrays across a shuffle.
    """
    if stride is None:
        stride = chunk_tokens
    if chunk_tokens < 1 or stride < 1:
        raise ValueError(
            f"chunk_tokens and stride must be >= 1, got "
            f"chunk_tokens={chunk_tokens} stride={stride}")
    toks = F.filter(F.split(F.col(text_col), r"\s+"),
                    lambda x: x != F.lit(""))
    n = F.size(toks)
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride)))
    base = df.select(*id_cols, toks.alias("_toks"),
                     starts.alias("_starts"))
    pos = F.posexplode("_starts")
    return (base.select(*id_cols, "_toks",
                        pos.alias("chunk_id", "start_tok"))
            .select(*id_cols,
                    F.col("chunk_id").cast("long"),
                    F.col("start_tok").cast("long"),
                    F.size(F.slice(F.col("_toks"),
                                   F.col("start_tok") + 1,
                                   chunk_tokens))
                    .cast("long").alias("n_chunk_tokens"),
                    F.array_join(
                        F.slice(F.col("_toks"),
                                F.col("start_tok") + 1, chunk_tokens),
                        " ").alias("chunk_text")))


# per-language stopword-marker sets for the multilingual ID (tiny
# fixed lists — a real system swaps in fastText; exactness of the
# ARGMAX plumbing is what the engine owns). All ratios share the
# token-count denominator, so comparing HIT COUNTS compares ratios
# exactly in integers.
LANG_MARKERS: dict[str, list[str]] = {
    "en": EN_MARKERS,
    "es": ["el", "la", "los", "las", "de", "del", "que", "y", "en",
           "un", "una", "es", "por", "con", "para", "su", "se", "no"],
    "fr": ["le", "la", "les", "des", "de", "du", "et", "est", "que",
           "une", "dans", "pour", "sur", "avec", "au", "pas", "ne"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den",
           "des", "ein", "eine", "nicht", "auf", "als", "auch",
           "sich", "zu"],
}


def lang_id_multi_expr(text: Column, threshold_num: int = 3,
                       threshold_den: int = 20,
                       markers: dict[str, list[str]] | None = None
                       ) -> Column:
    """Multilingual marker-vote language ID: the language whose
    marker set hits the most tokens wins, provided its hit ratio
    clears threshold_num/threshold_den (default 3/20 = 0.15, the
    lang_id_expr gate); otherwise 'other'.

    EXACT integer decisions end to end: hit counts share the token-
    count denominator so the argmax compares counts directly, the
    threshold is the cross-multiplication ``den·hits >= num·n_toks``,
    and ties break on language-code order ('de' < 'en' < 'es' <
    'fr') via min over (−hits, lang) structs — no float anywhere,
    the oracle replays each comparison verbatim. One narrow
    projection: per-row array HOFs only, whole-stage codegen.
    """
    markers = markers or LANG_MARKERS
    toks = tokens_expr(text)
    n = F.size(toks)
    cands = F.array(*[
        F.struct(
            (-F.size(F.filter(toks, lambda t: t.isin(ms))))
            .cast("long").alias("neg_hits"),
            F.lit(lang).alias("lang"))
        for lang, ms in sorted(markers.items())
    ])
    best = F.array_min(cands)
    hits = -best.getField("neg_hits")
    return F.when(
        (n > 0) & (F.lit(threshold_den) * hits
                   >= F.lit(threshold_num) * n),
        best.getField("lang")).otherwise(F.lit("other"))


# UTF-8-decoded-as-Windows-1252 artifacts, the dominant mojibake
# family in web crawls (ftfy's core case). Ordered list, applied in
# sequence — every source string is 2-3 chars starting 'â'/'Ã'/'Â'
# and none is a prefix of a later one, so application order between
# distinct keys can't interact. Conservative by design: only
# sequences that are overwhelmingly artifacts (the literal text
# 'â€™' is ~never intentional), never lone 'Ã'/'Â'.
MOJIBAKE_PAIRS: list[tuple[str, str]] = [
    ("â€™", "’"), ("â€˜", "‘"),   # curly quotes
    ("â€œ", "“"),                       # left double quote
    ("â€¦", "…"), ("â€¢", "•"),   # ellipsis, bullet
    ("Ã©", "é"), ("Ã¨", "è"), ("Ã¡", "á"), ("Ã³", "ó"),
    ("Ãº", "ú"), ("Ã±", "ñ"), ("Ã¼", "ü"), ("Ã¶", "ö"),
    ("Ã¤", "ä"), ("Ã§", "ç"),
    ("Ã ", "à"),  # 'Ã' + space: à's A0 byte transcoded to space
    ("Â°", "°"), ("Â£", "£"), ("Â·", "·"),
]


def fix_mojibake_expr(text: Column) -> Column:
    """Repair the common UTF-8-read-as-cp1252 double-encoding
    artifacts ('CafÃ©' → 'Café', 'donâ€™t' → 'don’t') — the encoding
    hygiene pass a web corpus runs after charset-decode and before
    any text filter (mojibake inflates OOV rates, breaks stopword
    hits, and poisons n-gram dedup keys). A fixed replace chain over
    MOJIBAKE_PAIRS — pure JVM string ops, no regex backtracking, no
    shuffle, no Python; the identical literal chain runs in the
    DuckDB oracle so repairs are byte-equal cross-engine."""
    out = text
    for bad, good in MOJIBAKE_PAIRS:
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out


def mojibake_sql(col: str = "text") -> str:
    """The DuckDB twin of fix_mojibake_expr: the same ordered
    replace() chain as a SQL expression string."""
    expr = col
    for bad, good in MOJIBAKE_PAIRS:
        b = bad.replace("'", "''")
        g = good.replace("'", "''")
        expr = f"replace({expr}, '{b}', '{g}')"
    return expr
