"""Multimodal plumbing (functions/multimodal.py) + the new similarity
ops (embedding near-dup, IVF ANN): Spark-side shape and numeric
correctness against plain-numpy recomputation / brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from simplecrawler_spark.functions import multimodal as MM
from simplecrawler_spark.functions.images import (
    decode_pixels, phash64, synth_pixels,
)
from simplecrawler_spark.operators import similarity as SIM
from simplecrawler_spark.sources.fixtures import synthetic_corpus


@pytest.fixture(scope="module")
def corpus(spark):
    df = synthetic_corpus(spark, n_images=24)
    df.persist().count()
    yield df
    df.unpersist()


def test_image_features_matches_numpy(corpus):
    rows = {r.image_id: r for r in MM.image_features(corpus).collect()}
    assert len(rows) == 24
    for k in (0, 7, 13):
        iid = f"img_{k:08d}"
        r = rows[iid]
        assert r.decode_ok
        src = next(c for c in corpus.collect() if c.image_id == iid)
        px = decode_pixels(bytes(src.bytes), src.fmt, src.w, src.h)
        luma = px.astype(np.float64).mean(axis=2)
        assert r.mean_luma == pytest.approx(float(luma.mean()))
        assert r.std_luma == pytest.approx(float(luma.std()))
        assert r.phash == phash64(px)


def test_resize_shape_and_content(corpus):
    out = MM.resize_images(corpus, 16, 12).collect()
    assert len(out) == 24
    for r in out:
        assert (r.w, r.h, r.fmt) == (16, 12, "raw")
        px = np.frombuffer(bytes(r.bytes), dtype=np.uint8)
        assert px.shape == (12 * 16 * 3,)
    # spot-check nearest-neighbour correctness for one image
    r0 = next(r for r in out if r.image_id == "img_00000000")
    full = synth_pixels(0)
    h, w = full.shape[:2]
    ri = (np.arange(12) * h) // 12
    ci = (np.arange(16) * w) // 16
    expect = full[np.ix_(ri, ci)]
    got = np.frombuffer(bytes(r0.bytes), dtype=np.uint8).reshape(12, 16, 3)
    assert np.array_equal(expect, got)


def test_sample_frames_explodes_every_nth(spark):
    w, h, nf = 8, 6, 25
    rng = np.random.Generator(np.random.PCG64(7))
    frames = rng.integers(0, 255, size=(nf, h, w, 3), dtype=np.uint8)
    vid = spark.createDataFrame(
        [("v0", frames.tobytes(), w, h, "rawvid", nf)],
        "video_id string, bytes binary, w int, h int, fmt string, "
        "n_frames int")
    out = MM.sample_frames(vid, every_n=10).collect()
    assert [r.frame_no for r in sorted(out, key=lambda r: r.frame_no)] == \
        [0, 10, 20]
    for r in out:
        got = np.frombuffer(bytes(r.bytes), dtype=np.uint8).reshape(h, w, 3)
        assert np.array_equal(frames[r.frame_no], got)


def test_sample_frames_unknown_fmt_raises(spark):
    vid = spark.createDataFrame(
        [("v0", b"xx", 1, 1, "mp4", 1)],
        "video_id string, bytes binary, w int, h int, fmt string, "
        "n_frames int")
    with pytest.raises(Exception, match="NotImplementedError|mp4"):
        MM.sample_frames(vid).collect()


def test_audio_features_pcm16(spark):
    sr = 8000
    t = np.arange(sr) / sr
    wave = (np.sin(2 * np.pi * 440 * t) * 16384).astype(np.int16)
    adf = spark.createDataFrame(
        [("a0", wave.tobytes(), "pcm16", sr)],
        "audio_id string, bytes binary, fmt string, sample_rate int")
    r = MM.audio_features(adf).collect()[0]
    assert r.n_samples == sr
    assert r.duration_s == pytest.approx(1.0)
    assert r.rms == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)
    assert r.peak == pytest.approx(0.5, rel=1e-3)
    assert abs(r.zero_crossings - 880) <= 2


# ---------------------------------------------------------------------------
# similarity: near-dup pairs + IVF
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def embeddings(spark):
    """40 base vectors + 10 planted near-duplicates (tiny noise)."""
    rng = np.random.Generator(np.random.PCG64(11))
    base = rng.normal(size=(40, 16))
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    rows += [(100 + i,
              [float(x) for x in base[i] + rng.normal(0, 0.01, 16)])
             for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    df.persist().count()
    yield df
    df.unpersist()


def test_cosine_pairs_exact_finds_planted(embeddings):
    got = {(r.id_a, r.id_b)
           for r in SIM.cosine_pairs_exact(embeddings, 0.99).collect()}
    planted = {(i, 100 + i) for i in range(10)}
    assert planted <= got


def test_embedding_near_dup_recall_vs_exact(embeddings):
    exact = {(r.id_a, r.id_b)
             for r in SIM.cosine_pairs_exact(embeddings, 0.99).collect()}
    blocked = {(r.id_a, r.id_b)
               for r in SIM.embedding_near_dup(
                   embeddings, 0.99, n_planes=6).collect()}
    assert blocked <= exact  # verification step: no false positives
    assert len(blocked & exact) / max(len(exact), 1) >= 0.8


def test_ann_ivf_matches_bruteforce_topk(embeddings):
    query = [1.0] + [0.0] * 15
    brute = [r.vec_id
             for r in SIM.cosine_topk(embeddings, query, k=5).collect()]
    ivf = [r.vec_id
           for r in SIM.ann_ivf_topk(embeddings, query, k=5, n_cells=8,
                                     nprobe=8).collect()]
    # nprobe == n_cells → exhaustive → exact parity
    assert ivf == brute


def test_ivf_kmeans_refinement_recall(embeddings):
    """Round-2 verdict item 6: Lloyd's-refined centroids (opt-in) give
    recall vs brute force ≥ the deterministic lowest-id pick on the
    planted corpus at the same nprobe; the default path (q_ivf_assign's
    oracle twin) is untouched."""
    query = [1.0] + [0.0] * 15
    brute = {r.vec_id
             for r in SIM.cosine_topk(embeddings, query, k=10).collect()}

    def recall(cents):
        got = {r.vec_id
               for r in SIM.ann_ivf_topk(embeddings, query, k=10,
                                         n_cells=8, nprobe=2,
                                         centroids=cents).collect()}
        return len(got & brute) / len(brute)

    base = SIM.ivf_centroids(embeddings, n_cells=8)
    refined = SIM.ivf_centroids_kmeans(embeddings, n_cells=8, n_iters=3)
    assert recall(refined) >= recall(base)
    # refinement actually moved the centroids off the raw sample
    assert refined != base
    # k-means on this corpus keeps every cell non-degenerate enough to
    # assign all rows somewhere (sanity: full partition of the data)
    n = SIM.ivf_assign(embeddings, refined).count()
    assert n == embeddings.count()


def test_embedding_near_dup_empty_input(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    df = SIM.embedding_near_dup(empty, 0.9)
    assert df.count() == 0
    assert df.columns == ["id_a", "id_b", "cosine"]


def test_ann_ivf_topk_join_exhaustive_matches_per_query(embeddings):
    """Batched ANN (round-3 verdict item 5): with nprobe == n_cells the
    join path is exhaustive, so every query row must reproduce the
    single-vector cosine_topk ranking exactly."""
    qrows = embeddings.orderBy("vec_id").limit(3).collect()
    queries = embeddings.sparkSession.createDataFrame(
        [(r.vec_id, r.embedding) for r in qrows],
        "query_id long, embedding array<float>")
    out = SIM.ann_ivf_topk_join(embeddings, queries, k=5,
                                n_cells=8, nprobe=8)
    assert out.columns == ["query_id", "vec_id", "cosine", "rank"]
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, []).append((r.rank, r.vec_id))
    for qr in qrows:
        brute = [r.vec_id for r in SIM.cosine_topk(
            embeddings, list(qr.embedding), k=5).collect()]
        assert [v for _, v in sorted(got[qr.vec_id])] == brute


def test_ann_ivf_topk_join_blocked_recall(embeddings):
    """nprobe < n_cells: per-query results stay a subset of the cell
    universe with rank 1..k contiguous, and the query's own vector
    (cosine 1.0 in its home cell) is always recalled at rank 1."""
    qrows = embeddings.orderBy("vec_id").limit(5).collect()
    queries = embeddings.sparkSession.createDataFrame(
        [(r.vec_id, r.embedding) for r in qrows],
        "query_id long, embedding array<float>")
    out = SIM.ann_ivf_topk_join(embeddings, queries, k=3,
                                n_cells=8, nprobe=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {r.vec_id for r in qrows}
    for qid, rows in by_q.items():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        top = min(rows, key=lambda r: r.rank)
        assert top.vec_id == qid and top.cosine == 1.0


def test_ann_ivf_topk_join_empty_corpus(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(1, [1.0] * 16)], "query_id long, embedding array<float>")
    out = SIM.ann_ivf_topk_join(empty, queries, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "vec_id", "cosine", "rank"]


def test_ann_ivf_prunes_cells(embeddings):
    cents = SIM.ivf_centroids(embeddings, n_cells=8)
    assigned = SIM.ivf_assign(embeddings, cents)
    n_cells_used = assigned.select("cell").distinct().count()
    assert 1 < n_cells_used <= 8
    query = [1.0] + [0.0] * 15
    pruned = SIM.ann_ivf_topk(embeddings, query, k=5, n_cells=8, nprobe=2,
                              centroids=cents)
    assert pruned.count() <= 5


def test_ivf_build_probe_partition_pruned(spark, tmp_path, embeddings):
    """ivf_build writes the inverted file partitioned by cell;
    ann_ivf_probe must (a) return exactly what the in-memory IVF
    returns for the same centroids/nprobe, and (b) plan a
    partition-pruned scan — the cell filter appears as a
    PartitionFilter, so non-probed cells' files are never opened."""
    import contextlib
    import io

    path = str(tmp_path / "ivf")
    cents = SIM.ivf_build(embeddings, path, n_cells=8)
    query = [1.0] + [0.0] * 15

    got = [(r.vec_id, r.cosine) for r in
           SIM.ann_ivf_probe(spark, path, query, k=5, nprobe=2).collect()]
    want = [(r.vec_id, r.cosine) for r in
            SIM.ann_ivf_topk(embeddings, query, k=5, nprobe=2,
                             centroids=cents).collect()]
    assert got == want

    with open(f"{path}/_centroids.json") as fh:
        import json
        assert json.load(fh) == cents

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        SIM.ann_ivf_probe(spark, path, query, k=5, nprobe=2).explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    # the cell predicate must sit in the partition filters (pruned at
    # planning), not in the data filters
    pf_line = [l for l in plan.splitlines() if "PartitionFilters" in l][-1]
    assert "cell" in pf_line


# ---------------------------------------------------------------------------
# aspect bucketing / caption gate / image dedup clustering (round 3)
# ---------------------------------------------------------------------------

def test_synth_dims_match_pixels():
    from simplecrawler_spark.functions.images import synth_dims

    for k in range(24):
        assert synth_dims(k) == synth_pixels(k).shape[:2]


def test_aspect_bucket_assignment(spark):
    rows = [("a", 100, 100), ("b", 400, 300), ("c", 300, 400),
            ("d", 160, 90), ("e", 90, 160), ("f", 128, 32)]
    df = spark.createDataFrame(rows, "image_id string, w int, h int")
    got = {r.image_id: (r.bucket, r.target_w, r.target_h)
           for r in MM.assign_aspect_bucket(df).collect()}
    assert got == {
        "a": ("square", 512, 512), "b": ("landscape", 576, 448),
        "c": ("portrait", 448, 576), "d": ("wide", 672, 384),
        "e": ("tall", 384, 672),
        # 4:1 is nearest 16:9 by exact rational distance
        "f": ("wide", 672, 384),
    }


def test_caption_image_gate(spark):
    rows = [
        # ok on every gate
        ("ok", "a quiet harbor at dawn #00000042", 64, 64, "raw"),
        ("short_cap", "a quiet", 64, 64, "raw"),
        ("tiny", "a quiet harbor at dawn #00000042", 32, 64, "pngz"),
        ("stretched", "a quiet harbor at dawn #00000042", 127, 48, "raw"),
        ("badfmt", "a quiet harbor at dawn #00000042", 64, 64, "jpeg"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, caption string, w int, h int, fmt string")
    got = {r.image_id: r for r in
           MM.caption_image_gate(df, min_tokens=4).collect()}
    assert got["ok"].keep
    assert not got["short_cap"].caption_ok and not got["short_cap"].keep
    assert not got["tiny"].dims_ok
    assert not got["stretched"].aspect_ok  # 127 > 2*48 exactly-integer
    assert not got["badfmt"].fmt_ok
    assert got["tiny"].caption_ok  # gates are independent


def test_image_dedup_cluster_finds_planted_pairs(spark):
    """near_dup_corpus plants a perturbed copy (id k+100000) of every
    3rd image; pHash band pairs + connected components must cluster
    each variant with its base (planted hamming measured 0-8; the
    one pair above the <=6 gate is deterministically excluded on both
    engines) and never merge unrelated images (cross hamming >=22)."""
    from simplecrawler_spark.operators import dedup as D
    from simplecrawler_spark.sources.fixtures import (
        NEAR_DUP_ID_OFFSET, near_dup_corpus,
    )

    corpus = near_dup_corpus(spark, n_images=48)
    fp = corpus.select(
        F.regexp_extract("image_id", r"img_0*(\d+)", 1)
        .cast("long").alias("doc_id"), "phash")
    pairs = D.fingerprint_near_dup(fp, fp_col="phash",
                                   max_hamming=6, n_bits=64)
    comp = {r.doc_id: r for r in
            D.connected_components(pairs).collect()}
    found = 0
    for k in range(0, 48, 3):
        v = k + NEAR_DUP_ID_OFFSET
        if v in comp and k in comp:
            assert comp[v].component == comp[k].component == k
            assert comp[k].is_survivor and not comp[v].is_survivor
            found += 1
    assert found >= 14  # 16 planted; at most the hamming-8 outlier missing
    # no unrelated merge: every component is {k, k+offset}
    for r in comp.values():
        assert r.doc_id % NEAR_DUP_ID_OFFSET == r.component


def test_clip_alignment_gate(spark):
    """Self-paired embeddings score exactly 1.0 (within float ulps of
    the same double expression numpy computes); orthogonal pairs score
    0; anti-parallel scores -1; a zero-norm embedding (encoder failure
    sentinel) scores 0.0 and drops rather than NaN-ing the gate."""
    rows = [
        ("same", [1.0, 2.0, 3.0], [1.0, 2.0, 3.0]),
        ("orth", [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
        ("anti", [1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]),
        ("zero", [0.0, 0.0, 0.0], [1.0, 2.0, 3.0]),
        ("mid", [1.0, 1.0, 0.0], [1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, img_emb array<float>, txt_emb array<float>")
    got = {r.image_id: r for r in
           MM.clip_alignment_gate(df, threshold=0.5).collect()}
    assert got["same"].alignment == pytest.approx(1.0) and got["same"].keep
    assert got["orth"].alignment == 0.0 and not got["orth"].keep
    assert got["anti"].alignment == pytest.approx(-1.0)
    assert got["zero"].alignment == 0.0 and not got["zero"].keep
    # cos(45°) = 1/sqrt(2): the numeric value, not just the flag
    assert got["mid"].alignment == pytest.approx(1.0 / np.sqrt(2.0))
    assert got["mid"].keep  # 0.707 >= 0.5


def test_clip_gate_plan_is_pure_jvm(spark):
    """The gate must stay narrow and JVM-side: no Exchange, no
    Python eval in the physical plan (at 10^10 pairs the gate runs
    where the rows live, ahead of any decode or shuffle)."""
    df = spark.createDataFrame(
        [("a", [1.0, 0.0], [1.0, 0.0])],
        "image_id string, img_emb array<float>, txt_emb array<float>")
    plan = (MM.clip_alignment_gate(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEvalPython" not in plan
