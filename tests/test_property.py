"""Property-based invariants (hypothesis): randomized inputs for the
two parity contracts whose fixed-fixture tests cover only a handful
of hand-picked shapes — the Arrow-vs-driver URL canonicaliser and the
rolling-vs-md5 substring-dedup decisions. Each example batches many
values into ONE Spark job so the suite stays fast."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

# --- URL strategy: realistic component soup, not raw unicode noise ----------

_scheme = st.sampled_from(["http", "https", "HTTP", "HtTpS"])
_hostlabel = st.text(alphabet="abcDEFgh123", min_size=1, max_size=6)
_host = st.lists(_hostlabel, min_size=1, max_size=3).map(".".join)
_port = st.sampled_from(["", ":80", ":443", ":8080", ":00080"])
_seg = st.sampled_from(["a", "B", "café", "..", ".", "x y", "%7Ez",
                        "index.html", ""])
_path = st.lists(_seg, min_size=0, max_size=4).map(
    lambda segs: "/" + "/".join(segs) if segs else "")
_param = st.tuples(st.sampled_from(["b", "a", "z", "K"]),
                   st.sampled_from(["1", "", "v v", "%20"]))
_query = st.lists(_param, min_size=0, max_size=3).map(
    lambda ps: "&".join(f"{k}={v}" if v else k for k, v in ps))
_frag = st.sampled_from(["", "top", "sec 2"])


@st.composite
def _url(draw):
    u = f"{draw(_scheme)}://{draw(_host)}{draw(_port)}{draw(_path)}"
    q = draw(_query)
    if q:
        u += "?" + q
    f = draw(_frag)
    if f:
        u += "#" + f
    return u


@settings(max_examples=8, deadline=None)
@given(st.lists(_url(), min_size=1, max_size=40))
def test_canonicalize_arrow_matches_driver(spark, urls):
    """canonicalize_df (the Arrow batch path every crawl round runs)
    must agree with canon_parts (the driver stdlib path seeds and
    tests use) on every component, for any URL shape."""
    from simplecrawler_spark.functions.canonical import (
        canon_parts, canonicalize_df,
    )

    df = spark.createDataFrame([(u,) for u in urls], "url_raw string")
    got = {r.url_raw: (r.url_norm, r.scheme, r.authority, r.host,
                       r.path, r.query, r.fragment)
           for r in canonicalize_df(df).collect()}
    for u in urls:
        assert got[u] == canon_parts(u), u


# --- substring dedup: rolling keys decide exactly like md5 keys -------------

_tok = st.sampled_from(["a", "b", "c", "d"])
_doc = st.lists(_tok, min_size=0, max_size=30).map(" ".join)


@settings(max_examples=6, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=12))
def test_substring_rolling_matches_md5_on_random_corpora(spark, texts):
    """The Karp–Rabin default and the md5 oracle twin must make the
    IDENTICAL removal decisions on arbitrary corpora — a tiny
    alphabet forces dense window duplication, the regime where a
    keying bug would actually flip a decision."""
    from simplecrawler_spark.operators.dedup import substring_dedup

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    out = {}
    for kf in ("rolling", "md5"):
        out[kf] = {r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
                   for r in substring_dedup(docs, window=3,
                                            key_fn=kf).collect()}
    assert out["rolling"] == out["md5"]
