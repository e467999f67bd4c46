"""Image payload codecs + perceptual hash + PSNR validation (P4,
SURVEY.md §2.4; input_hint BASELINE.json:15).

The reference never decodes images (non-HTML bodies are gated out,
/root/reference/simple_crawler/requester.py:75-79); the graft makes the
fetch payload an image+caption pair from the `corpus` table
(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64).

No Pillow in the sandbox, so codecs are numpy+zlib:
  * fmt 'raw'  — uint8 H×W×3 buffer, lossless.
  * fmt 'pngz' — 6-bit-quantised planes + zlib (the "lossy" format;
    quantisation error ±2 → PSNR ≈ 47 dB ≥ the 40 dB gate).
Real JPEG/PNG decode plugs in behind decode_pixels() when an imaging
library exists; everything Spark-side (schema, Arrow batching, join
shape) is identical.

phash: classic 8×8 DCT-sign hash (32×32 grey → DCT-II → top-left 8×8
minus DC → sign vs median), all numpy, deterministic.

Scale notes: pixels never enter a shuffle — the corpus join happens
after the seen-dedupe, validation runs in place (mapInPandas), and
only (psnr, phash_match, caption) survive into results. Arrow batch
size for binary rows is capped by the caller via
spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# deterministic synthesis (fixtures; seeded — no external data)
# ---------------------------------------------------------------------------

_ADJ = ["quiet", "bright", "rusty", "golden", "tiny", "vast", "pale", "bold"]
_NOUN = ["harbor", "forest", "engine", "window", "market", "glacier",
         "rooftop", "canyon"]
_VERB = ["at dawn", "in fog", "after rain", "at night", "in summer",
         "under snow", "at noon", "in motion"]


def synth_dims(k: int, seed: int = 42) -> tuple[int, int]:
    """(h, w) of synth_pixels(k, seed) WITHOUT generating pixels —
    replicates its first two RNG draws (pinned by
    tests/test_multimodal.py::test_synth_dims_match_pixels). Used by
    the DuckDB oracle builders (__spark_entry__) to inline the
    corpus' dimensions as SQL literals, the same way the caption
    vocab is inlined."""
    rng = np.random.Generator(np.random.PCG64(seed * 1_000_003 + k))
    return int(rng.integers(32, 128)), int(rng.integers(32, 128))


def perturb_pixels(pixels: np.ndarray, k: int, seed: int = 42,
                   sigma: float = 2.5) -> np.ndarray:
    """Deterministic mild perturbation of an image — the planted
    near-duplicate for pHash dedup tests/queries. Small gaussian
    noise flips only DCT coefficients near the phash median, so the
    perturbed copy stays within a few Hamming bits of the original."""
    rng = np.random.Generator(np.random.PCG64(seed * 7_919 + k))
    img = pixels.astype(np.float64) + rng.normal(0, sigma,
                                                 size=pixels.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def synth_pixels(k: int, seed: int = 42) -> np.ndarray:
    """Deterministic H×W×3 uint8 image for corpus index k."""
    rng = np.random.Generator(np.random.PCG64(seed * 1_000_003 + k))
    h = int(rng.integers(32, 128))
    w = int(rng.integers(32, 128))
    # low-frequency gradient + noise → structured content, stable phash
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        128 + 64 * np.sin(xx / (8 + k % 13)) + 48 * np.cos(yy / (6 + k % 7))
    )
    img = base[..., None] + rng.normal(0, 12, size=(h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def synth_caption(k: int) -> str:
    return (f"a {_ADJ[k % 8]} {_NOUN[(k // 8) % 8]} {_VERB[(k // 64) % 8]}"
            f" #{k:08d}")


def image_id_of(k: int) -> str:
    return f"img_{k:08d}"


def k_of_image_id(image_id: str) -> int:
    return int(image_id.split("_")[1])


# ---------------------------------------------------------------------------
# codecs
# ---------------------------------------------------------------------------

def encode_pixels(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return pixels.tobytes()
    if fmt == "pngz":
        q = ((pixels >> 2) << 2) | 2  # 6-bit quantise, mid-tread
        return zlib.compress(q.tobytes(), level=6)
    raise NotImplementedError(
        f"fmt {fmt!r}: real image codecs need an imaging library not "
        "present in this sandbox — plug in here")


def decode_pixels(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    if fmt == "raw":
        return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    if fmt == "pngz":
        return np.frombuffer(zlib.decompress(data),
                             dtype=np.uint8).reshape(h, w, 3)
    raise NotImplementedError(f"fmt {fmt!r} (see encode_pixels)")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10 * np.log10(255.0 ** 2 / mse))


# ---------------------------------------------------------------------------
# perceptual hash (8×8 DCT-sign)
# ---------------------------------------------------------------------------

_DCT32 = None


def _dct_basis(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        _DCT32 = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    return _DCT32


def phash64(pixels: np.ndarray) -> int:
    grey = pixels.astype(np.float64).mean(axis=2)
    h, w = grey.shape
    # nearest-neighbour resample to 32×32 (no scipy in sandbox)
    ri = (np.arange(32) * h) // 32
    ci = (np.arange(32) * w) // 32
    small = grey[np.ix_(ri, ci)]
    d = _dct_basis()
    coef = d @ small @ d.T
    block = coef[:8, :8].flatten()[1:]  # drop DC
    bits = block > np.median(block)
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    # signed 64-bit for Spark LongType
    return val - (1 << 63) if val >= (1 << 63) else val


def dhash64(pixels: np.ndarray) -> int:
    """Difference hash: luma resampled to 9×8, each bit = left pixel
    brighter than its right neighbour. The cheap gradient complement
    to phash64 (no DCT): robust to uniform brightness/contrast shifts
    — a gradient compares two pixels under the same transform — but
    sensitive to crops where pHash is not, so image-dedup pipelines
    band on BOTH and union the candidate pairs (same
    fingerprint_near_dup blocking, just a second fingerprint
    column). Same signed-64 packing as phash64."""
    grey = pixels.astype(np.float64).mean(axis=2)
    h, w = grey.shape
    ri = (np.arange(8) * h) // 8
    ci = (np.arange(9) * w) // 9
    small = grey[np.ix_(ri, ci)]
    bits = (small[:, :-1] > small[:, 1:]).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 63) if val >= (1 << 63) else val


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

VALIDATE_STRUCT = T.StructType([
    T.StructField("psnr_db", T.DoubleType()),
    T.StructField("phash_computed", T.LongType()),
    T.StructField("phash_match", T.BooleanType()),
    T.StructField("pixels_ok", T.BooleanType()),
])


def make_validate_udf(psnr_gate_db: float = 40.0, seed: int = 42):
    """pandas UDF: decode corpus bytes, compare against the
    deterministic reference pixels for that image_id, compute phash.
    `pixels_ok` = exact match for 'raw', PSNR ≥ gate for lossy fmts
    (BASELINE.json:15)."""

    @F.pandas_udf(VALIDATE_STRUCT)
    def validate(image_id: pd.Series, data: pd.Series, fmt: pd.Series,
                 w: pd.Series, h: pd.Series,
                 phash_stored: pd.Series) -> pd.DataFrame:
        out = {k: [] for k in
               ("psnr_db", "phash_computed", "phash_match", "pixels_ok")}
        for iid, b, f_, w_, h_, ph in zip(image_id, data, fmt, w, h,
                                          phash_stored):
            if iid is None or b is None:
                for k in out:
                    out[k].append(None)
                continue
            dec = decode_pixels(bytes(b), f_, int(w_), int(h_))
            ref = synth_pixels(k_of_image_id(iid), seed)
            p = psnr(ref, dec)
            hp = phash64(dec)
            out["psnr_db"].append(min(p, 99.0))
            out["phash_computed"].append(hp)
            out["phash_match"].append(ph is not None and int(ph) == hp)
            ok = (np.array_equal(ref, dec) if f_ == "raw"
                  else p >= psnr_gate_db)
            out["pixels_ok"].append(bool(ok))
        return pd.DataFrame(out)

    return validate


def validate_corpus_join(results: DataFrame, corpus: DataFrame,
                         psnr_gate_db: float = 40.0,
                         seed: int = 42) -> DataFrame:
    """Join fetched image pages to the corpus payloads and validate
    per row. Pixels stay inside this one stage — the output carries
    only metrics + caption (SURVEY.md §7.3: keep binary out of
    shuffles)."""
    validate = make_validate_udf(psnr_gate_db, seed)
    # no broadcast hint: the corpus carries the pixel bytes and can be
    # arbitrarily large — AQE broadcasts whichever side is actually
    # small at runtime, else plans a shuffle equi-join on image_id
    joined = results.join(corpus.select(
        F.col("image_id").alias("c_image_id"), "bytes", "w", "h", "fmt",
        F.col("caption").alias("corpus_caption"), "phash"),
        results.image_id == F.col("c_image_id"), "left")
    v = validate(
        F.col("image_id"), F.col("bytes"), F.col("fmt"), F.col("w"),
        F.col("h"), F.col("phash"))
    return (
        joined.withColumn("_v", v)
        .select(*results.columns, F.col("corpus_caption"),
                F.col("_v.psnr_db").alias("psnr_db"),
                F.col("_v.phash_computed").alias("phash_computed"),
                F.col("_v.phash_match").alias("phash_match"),
                F.col("_v.pixels_ok").alias("pixels_ok"))
        .withColumn("caption", F.col("corpus_caption"))
        .drop("corpus_caption")
    )
