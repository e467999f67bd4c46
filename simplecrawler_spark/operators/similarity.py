"""Similarity search over embedding columns (array<float>):
brute-force cosine top-k (baseline) + random-hyperplane-LSH bucketed
ANN (the scale path).

Dot products are pure Spark expressions (zip_with + aggregate —
JVM-side); no Python in the scoring loop. The LSH variant's hyperplanes
are deterministic pseudo-random vectors derived from a seed via md5, so
the oracle/tests can reproduce them.

Scale notes: brute force is a full scan per query — O(N·d) but
embarrassingly parallel and shuffle-free (top-k via a single reduce).
The LSH path prunes the scan to matching buckets: signatures are
precomputed once (narrow), the query probes only its own bucket(s) —
at 10^10 rows this is the difference between a cluster-wide scan and a
few partitions.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dbl(a):
    # float32 embeddings → float64 before arithmetic: matches the
    # DuckDB oracle (embedding::DOUBLE[]) bit-for-bit and avoids
    # accumulation drift
    return F.transform(a, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(_dbl(a), lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_expr(vec_col, query: list[float]):
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = math.sqrt(sum(x * x for x in query))
    return F.when(
        _norm(vec_col) > 0, _dot(vec_col, q) / (_norm(vec_col) * F.lit(qn))
    ).otherwise(F.lit(0.0))


def cosine_topk(embeddings: DataFrame, query: list[float], k: int = 10,
                vec_col: str = "embedding",
                id_col: str = "vec_id") -> DataFrame:
    """Brute-force cosine top-k: the exact baseline every ANN variant
    is verified against."""
    scored = embeddings.select(
        F.col(id_col), F.round(cosine_expr(F.col(vec_col), query), 6)
        .alias("cosine"))
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: components from md5
    bytes mapped to [-1, 1]. Reproducible anywhere (oracle/tests)."""
    planes = []
    for p in range(n_planes):
        vals: list[float] = []
        ctr = 0
        while len(vals) < dim:
            d = hashlib.md5(f"plane{seed}|{p}|{ctr}".encode()).digest()
            vals.extend(b / 127.5 - 1.0 for b in d)
            ctr += 1
        planes.append(vals[:dim])
    return planes


def lsh_signature_expr(vec_col, planes: list[list[float]]):
    """Bit b = sign(vec · plane_b) packed into an int."""
    sig = F.lit(0)
    for b, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        sig = sig + F.when(_dot(vec_col, p) > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return sig


def ann_lsh_topk(embeddings: DataFrame, query: list[float], k: int = 10,
                 n_planes: int = 8, seed: int = 42,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 multiprobe_bits: int = 1) -> DataFrame:
    """Bucketed ANN: score only rows whose hyperplane signature is
    within `multiprobe_bits` Hamming distance of the query's bucket
    (multi-probe softens LSH misses)."""
    dim = len(query)
    planes = hyperplanes(dim, n_planes, seed)
    q_sig = 0
    for b, plane in enumerate(planes):
        if sum(x * y for x, y in zip(query, plane)) > 0:
            q_sig |= 1 << b
    probe = {q_sig}
    if multiprobe_bits >= 1:
        probe |= {q_sig ^ (1 << b) for b in range(n_planes)}
    sig = embeddings.withColumn(
        "_sig", lsh_signature_expr(F.col(vec_col), planes))
    candidates = sig.where(F.col("_sig").isin(list(probe)))
    return cosine_topk(candidates, query, k, vec_col, id_col)
