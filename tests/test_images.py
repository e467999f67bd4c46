"""Image corpus codecs, phash, PSNR validation (BASELINE.json:15)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from simplecrawler_spark.functions import images as I
from simplecrawler_spark.sources.fixtures import synthetic_corpus


def test_raw_roundtrip_exact():
    px = I.synth_pixels(4)
    dec = I.decode_pixels(I.encode_pixels(px, "raw"), "raw",
                          px.shape[1], px.shape[0])
    assert np.array_equal(px, dec)


def test_pngz_lossy_psnr_gate():
    for k in range(0, 20):
        px = I.synth_pixels(k)
        dec = I.decode_pixels(I.encode_pixels(px, "pngz"), "pngz",
                              px.shape[1], px.shape[0])
        assert I.psnr(px, dec) >= 40.0, k


def test_unknown_fmt_is_stubbed():
    with pytest.raises(NotImplementedError):
        I.encode_pixels(I.synth_pixels(0), "jpeg")


def test_phash_deterministic_and_robust():
    px = I.synth_pixels(7)
    h1 = I.phash64(px)
    assert h1 == I.phash64(px.copy())
    # quantisation must not flip the perceptual hash
    dec = I.decode_pixels(I.encode_pixels(px, "pngz"), "pngz",
                          px.shape[1], px.shape[0])
    diff = bin((h1 ^ I.phash64(dec)) & ((1 << 64) - 1)).count("1")
    assert diff <= 4
    # a different image must differ
    other = I.phash64(I.synth_pixels(8))
    assert bin((h1 ^ other) & ((1 << 64) - 1)).count("1") > 10


def test_corpus_validation_df(spark):
    corpus = synthetic_corpus(spark, 16)
    pages = spark.createDataFrame(
        [(f"http://h/{k}", I.image_id_of(k)) for k in range(16)],
        ["url_norm", "image_id"])
    out = I.validate_corpus_join(pages, corpus)
    rows = out.collect()
    assert len(rows) == 16
    for r in rows:
        assert r.pixels_ok, r.image_id
        assert r.phash_match, r.image_id
        assert r.psnr_db >= 40.0
        k = int(r.image_id.split("_")[1])
        assert r.caption == I.synth_caption(k)


def test_corpus_schema(spark):
    corpus = synthetic_corpus(spark, 4)
    assert [f.name for f in corpus.schema.fields] == [
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    first = corpus.orderBy("image_id").first()
    assert first.fmt == "raw" and isinstance(first.phash, int)


def test_sniff_format_expr_magic_numbers(spark):
    """functions/multimodal.py sniff_format_expr: every format class
    by its magic bytes; declared-format lies don't matter — only the
    payload prefix does."""
    from pyspark.sql import functions as F

    from simplecrawler_spark.functions.multimodal import (
        sniff_format_expr,
    )

    rows = [
        (1, bytes.fromhex("FFD8FFE0") + b"rest", "jpeg"),
        (2, bytes.fromhex("89504E470D0A1A0A") + b"x", "png"),
        (3, b"GIF89a...", "gif"),
        (4, b"GIF87a...", "gif"),
        (5, b"RIFF\x00\x01\x02\x03WEBPVP8 ", "webp"),
        (6, b"BMxxxx", "bmp"),
        (7, b"plain text", "unknown"),
        (8, b"", "unknown"),
        (9, bytes.fromhex("FFD8"), "unknown"),      # truncated jpeg
        (10, b"RIFF\x00\x01\x02\x03WAVEfmt ", "unknown"),  # RIFF!=webp
    ]
    df = spark.createDataFrame([(i, b) for i, b, _ in rows],
                               "id long, bytes binary")
    got = {r.id: r.f for r in df.select(
        "id", sniff_format_expr(F.col("bytes")).alias("f")).collect()}
    for i, _, want in rows:
        assert got[i] == want, (i, got[i], want)


def test_dhash_deterministic_brightness_invariant():
    """dHash is gradient-based: a uniform brightness shift flips NO
    bit (every comparison sees both pixels shifted equally); a
    different image differs in many bits; perturbation noise stays
    within a small radius."""
    import numpy as np

    px = I.synth_pixels(7)
    h1 = I.dhash64(px)
    assert h1 == I.dhash64(px.copy())
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    # +20 brightness with no saturation (cap the base first so the
    # shift can't compress any pairwise ordering)
    base = np.minimum(px, 215)
    brighter = (base.astype(np.int16) + 20).astype(np.uint8)
    assert ham(I.dhash64(base), I.dhash64(brighter)) == 0
    assert ham(h1, I.dhash64(I.synth_pixels(8))) > 10
    noisy = I.perturb_pixels(px, 7)
    assert ham(h1, I.dhash64(noisy)) <= 6


def test_dhash_bands_with_fingerprint_near_dup(spark):
    """The second fingerprint column rides the SAME banded blocking:
    perturbed copies pair, distinct images don't."""
    from simplecrawler_spark.operators.dedup import fingerprint_near_dup

    rows = []
    for k in range(6):
        px = I.synth_pixels(k)
        rows.append((2 * k, I.dhash64(px)))
        rows.append((2 * k + 1, I.dhash64(I.perturb_pixels(px, k))))
    df = spark.createDataFrame(rows, "doc_id long, fingerprint long")
    pairs = {(r.id_a, r.id_b)
             for r in fingerprint_near_dup(df, max_hamming=6).collect()}
    for k in range(6):
        assert (2 * k, 2 * k + 1) in pairs
    assert all(b == a + 1 and a % 2 == 0 for a, b in pairs)
