"""Training-batch assembly: token-budget shard packing and
domain-mix rebalancing.

After cleaning/dedup (operators/dedup.py, functions/text.py) a
pretraining pipeline still has to (a) carve the surviving corpus into
fixed-token-budget shards for the data loader and (b) reweight the
domain mixture (web/books/code/...) to target fractions. The
reference crawler stops at fetch+store (crawler.py:240-260 writes a
results dict) — these are the downstream operators a 100 TB corpus
consumer needs, same family as the cleaning stages.

Scale shapes (the design constraints at 10^10 documents):

* ``pack_sequences`` needs a GLOBAL running token offset — the naive
  form is one window over one partition (a single-task sort of the
  whole corpus). Implemented instead as the classic two-phase
  distributed prefix sum: deterministic hash-range bucketing into P
  partitions, per-partition window cumsum (P-way parallel), then a
  P-row per-partition-total aggregate whose own cumsum rides back via
  a broadcast join. The only wide ops are one P-way hash shuffle and
  one P-row agg; nothing about the plan changes at 1000 executors.
* ``rebalance_mix`` must NOT rank-per-source (the largest domain's
  window would serialise into one task — the exact skew the crawl's
  salted repartition exists to avoid). Selection is instead a pure
  per-row hash threshold: a tiny per-source count aggregate fixes the
  keep-probability p_s, broadcast back, and every row decides locally
  with the same md5 bucket contract as split_assign_expr. Kept counts
  are binomial(n_s, p_s) rather than exact — the documented price of
  a shuffle-free selection that never moves a document row.

Both stay engine-portable (the md5/hex contract from
functions/text.py) so the DuckDB oracle replays them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from simplecrawler_spark.functions.text import (
    SPLIT_BUCKETS,
    hash_long60,
    token_count_expr,
)

__all__ = ["pack_sequences", "pack_weighted", "rebalance_mix",
           "temperature_weights",
           "assemble_epochs"]


def pack_weighted(docs: DataFrame, weight, budget: int,
                  id_col: str = "doc_id", n_ranges: int = 64,
                  salt: str = "pack|",
                  weight_name: str = "weight") -> DataFrame:
    """Assign each row to a fixed-WEIGHT-budget shard — the generic
    core of pack_sequences (weight = tokens) and the webdataset-style
    image case (weight = payload bytes: a 10^10-image corpus ships as
    ~size-bounded shards so loader I/O per shard is predictable).

    Rows are laid out in a deterministic global order (md5-hash
    range, then id — reproducible across runs, engines, and cluster
    sizes, unlike any rand()/partition-id scheme), a global running
    weight offset is computed, and a row belongs to the shard its
    first unit lands in: shard_id = floor(offset_before / budget).

    Returns (id_col, weight_name, shard_id).

    The global offset is a two-phase distributed prefix sum over
    ``n_ranges`` deterministic hash buckets: per-bucket window cumsum
    runs n_ranges-way parallel, and only the n_ranges per-bucket
    totals pass through the tiny second phase. ``n_ranges`` should be
    ~2-4x the executor count at scale; it changes parallelism only,
    never the assignment (the order is (hash, id), bucket = hash
    prefix, so bucket boundaries align with the order).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if not 1 <= n_ranges <= SPLIT_BUCKETS:
        raise ValueError("n_ranges out of range")
    bucket_width = SPLIT_BUCKETS // n_ranges + 1
    h = hash_long60(F.col(id_col).cast("string"), salt) % SPLIT_BUCKETS
    base = docs.select(
        F.col(id_col),
        h.alias("_h"),
        (h / F.lit(bucket_width)).cast("int").alias("_rng"),
        weight.cast("long").alias(weight_name))

    # phase 1: cumsum within each hash range (parallel over ranges)
    w_local = (Window.partitionBy("_rng")
               .orderBy(F.col("_h").asc(), F.col(id_col).asc())
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = base.withColumn("_cum_in", F.sum(weight_name).over(w_local))

    # phase 2: per-range totals (n_ranges rows) -> exclusive offsets;
    # the window below runs over <= n_ranges rows, not the corpus
    w_off = (Window.orderBy(F.col("_rng").asc())
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (base.groupBy("_rng")
               .agg(F.sum(weight_name).alias("_tot"))
               .select("_rng", F.coalesce(F.sum("_tot").over(w_off),
                                          F.lit(0)).alias("_off")))

    return (local.join(F.broadcast(offsets), "_rng")
            .select(id_col, weight_name,
                    F.floor((F.col("_off") + F.col("_cum_in")
                             - F.col(weight_name))
                            / F.lit(budget)).alias("shard_id")))


def pack_sequences(docs: DataFrame, budget_tokens: int = 4096,
                   text_col: str = "text", id_col: str = "doc_id",
                   n_ranges: int = 64,
                   salt: str = "pack|") -> DataFrame:
    """Token-budget shard packing (see pack_weighted for the layout
    and the two-phase distributed prefix sum): every shard spans
    ~budget_tokens tokens; the last document of a shard may straddle
    the boundary — standard pretraining packing, where the loader
    truncates or wraps at the seam. Returns
    (id_col, n_tokens, shard_id)."""
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    return pack_weighted(
        docs, token_count_expr(F.col(text_col)), budget_tokens,
        id_col=id_col, n_ranges=n_ranges, salt=salt,
        weight_name="n_tokens")


def rebalance_mix(docs: DataFrame, targets: dict[str, float],
                  source_col: str = "source", id_col: str = "doc_id",
                  salt: str = "mix|") -> DataFrame:
    """Downsample per-domain so the surviving corpus matches the
    target mixture, without upsampling and at the largest size the
    targets allow.

    ``targets`` maps source value -> desired fraction of the output
    (must sum to ~1). With n_s documents in source s, the achievable
    output size is ``scale = min_s(n_s / frac_s)`` and each source
    keeps ~``frac_s * scale`` documents, chosen by the deterministic
    md5 bucket of the id (lowest buckets first — stable under corpus
    growth, engine-portable). Sources absent from ``targets`` are
    dropped.

    Returns (id_col, source_col, keep) for every input row whose
    source is targeted; ``keep`` marks survivors. A targeted source
    ABSENT from the corpus contributes no rows and no scale
    constraint — the mixture is balanced over the sources actually
    present (strict all-or-nothing semantics would instead need
    scale=0; callers wanting that should validate presence first). Kept counts are
    binomial, not exact (see module docstring); the threshold is
    computed from a per-source count aggregate that produces one row
    per source and broadcasts back — no document row ever shuffles.
    """
    total = sum(targets.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"target fractions must sum to 1, got {total}")
    if any(f <= 0 for f in targets.values()):
        raise ValueError("target fractions must be positive")

    tgt = F.create_map(*[F.lit(x) for kv in targets.items() for x in kv])
    sized = (docs.where(F.col(source_col).isin(list(targets)))
             .select(F.col(id_col), F.col(source_col)))
    counts = (sized.groupBy(source_col)
              .agg(F.count("*").alias("_n"))
              .withColumn("_frac", tgt[F.col(source_col)])
              .withColumn("_cap", F.col("_n") / F.col("_frac")))
    # scale = min over sources of n_s/frac_s : a 1-row agg, then a
    # broadcast back onto the per-source thresholds
    scale = counts.agg(F.min("_cap").alias("_scale"))
    thresholds = (counts.crossJoin(F.broadcast(scale))
                  .select(source_col,
                          F.least(
                              F.lit(SPLIT_BUCKETS),
                              F.floor(F.col("_frac") * F.col("_scale")
                                      / F.col("_n") * SPLIT_BUCKETS)
                              .cast("long")).alias("_thr")))
    bucket = hash_long60(F.col(id_col).cast("string"), salt) % SPLIT_BUCKETS
    return (sized.join(F.broadcast(thresholds), source_col)
            .select(id_col, source_col,
                    (bucket < F.col("_thr")).alias("keep")))


def temperature_weights(docs: DataFrame, tau: float = 0.7,
                        source_col: str = "source",
                        scale: int = 10 ** 6) -> DataFrame:
    """Temperature-scaled mixture shares (the XLM-R / mT5
    multilingual sampling rule): source s gets sampling share
    p_s ∝ n_s^τ. τ=1 is the natural mixture, τ→0 uniform; τ≈0.7
    boosts low-resource sources without letting the head drown them.
    This computes the TARGET mixture that rebalance_mix /
    assemble_epochs then materialise.

    Returns (source_col, n_docs, w_scaled, p_ppm):
      w_scaled = floor(n_docs^τ · scale) — the ONE float op per
      source, floored to int64 immediately (cross-engine discipline);
      p_ppm = w_scaled·1e6 DIV Σw_scaled — exact integer share.

    Scale shape: one map-side-combinable count per source, a 1-row
    broadcast total, a narrow projection. Source cardinality is tiny
    (domains/languages), so this is free at any corpus size."""
    if tau <= 0:
        raise ValueError(f"tau must be positive, got {tau}")
    counts = (docs.groupBy(source_col)
              .agg(F.count("*").cast("long").alias("n_docs")))
    w = F.floor(F.pow(F.col("n_docs").cast("double"),
                      F.lit(float(tau))) * F.lit(scale)).cast("long")
    ws = counts.withColumn("w_scaled", w)
    tot = ws.agg(F.sum("w_scaled").alias("_wsum"))
    # the ppm multiply widens through DECIMAL(38,0): in int64,
    # w_scaled·1e6 overflows once a source passes ~9.2e6 docs at
    # tau=1 (w_scaled = n_docs·scale) — the decimal product is exact
    # at any corpus size and the DIV result is back in int64 range
    # by construction (p_ppm ≤ 1e6). DuckDB's twin needs no cast:
    # its int multiply already promotes to HUGEINT.
    return (ws.crossJoin(F.broadcast(tot))
            .select(source_col, "n_docs", "w_scaled",
                    F.expr("CAST((CAST(w_scaled AS DECIMAL(38,0))"
                           " * 1000000) DIV _wsum"
                           " AS BIGINT)").alias("p_ppm")))


def assemble_epochs(docs: DataFrame, weights: dict[str, float],
                    source_col: str = "source", id_col: str = "doc_id",
                    salt: str = "epoch|") -> DataFrame:
    """Weighted epoch assembly: replicate each document
    ``weights[source]`` times (fractional weights round per-document
    by deterministic md5 bucket — weight 2.25 gives every doc 2
    copies and a stable 25% of docs a 3rd; weight 0.5 downsamples)
    and attach a deterministic global shuffle key. This is the
    "books x2, web x1, wiki x3" mixture knob every pretraining run
    applies between cleaning and sharding (the UPSAMPLING complement
    of rebalance_mix, which only downsamples).

    Returns (id_col, source_col, copy, order_key): one row per
    training copy, ``copy`` in [0, n), ``order_key`` =
    md5(salt|id|copy) — sorting by it is the epoch shuffle,
    reproducible across runs, engines, and cluster sizes (rand()
    is none of those). Sources absent from ``weights`` are dropped.

    Scale shape: ZERO shuffle in this operator — the weight lookup is
    a literal map, the copy fan-out is an in-codegen explode bounded
    by ceil(max weight), and the order key is a per-row hash. The
    epoch's one unavoidable global shuffle belongs to the consumer:
    ``repartitionByRange(order_key)`` gets uniformly-distributed
    16-hex keys, so the exchange is balanced regardless of the
    weights — and a doc's upsampled copies carry different keys, so
    they spread across the epoch instead of clumping (exactly what
    repeated-data SGD wants).
    """
    import math

    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be >= 0")
    # per-source integer (base copies, extra-copy bucket threshold) —
    # IEEE-double floor identical to the oracle's SQL arithmetic
    base = {s: int(math.floor(w)) for s, w in weights.items()}
    thr = {s: int(math.floor((w - math.floor(w)) * SPLIT_BUCKETS))
           for s, w in weights.items()}
    base_m = F.create_map(*[F.lit(x) for kv in base.items() for x in kv])
    thr_m = F.create_map(*[F.lit(x) for kv in thr.items() for x in kv])
    bucket = hash_long60(F.col(id_col).cast("string"), salt) % SPLIT_BUCKETS
    n = (base_m[F.col(source_col)]
         + F.when(bucket < thr_m[F.col(source_col)], 1).otherwise(0))
    sized = (docs.where(F.col(source_col).isin(list(weights)))
             .select(F.col(id_col), F.col(source_col), n.alias("_n"))
             .where(F.col("_n") > 0))
    out = sized.select(
        F.col(id_col), F.col(source_col),
        F.explode(F.sequence(F.lit(0), F.col("_n") - 1)).alias("copy"))
    order_key = F.md5(F.concat(
        F.lit(salt), F.col(id_col).cast("string"), F.lit("|"),
        F.col("copy").cast("string")))
    return out.select(F.col(id_col), F.col(source_col),
                      F.col("copy").cast("long").alias("copy"),
                      order_key.alias("order_key"))
