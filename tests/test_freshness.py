"""Recrawl scheduling (operators/freshness.py recrawl_priority):
change-rate arithmetic, first-seen semantics, now derivation,
tie-break determinism."""

from __future__ import annotations

from simplecrawler_spark.operators.freshness import recrawl_priority


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "url_hash string, ts_s long, fingerprint string, "
              "event_id long")


def _by_url(df):
    return {r.url_hash: r for r in df.collect()}


def test_change_rate_and_priority(spark):
    rows = [
        # A: 4 fetches, one change (x,x,y,y) -> lambda = 250000
        ("A", 100, "x", 1), ("A", 200, "x", 2),
        ("A", 300, "y", 3), ("A", 400, "y", 4),
        # B: changes EVERY fetch -> lambda = 2*10^6/3 = 666666
        ("B", 100, "p", 5), ("B", 200, "q", 6), ("B", 300, "r", 7),
        # C: static -> lambda 0 -> priority 0 regardless of age
        ("C", 50, "z", 8), ("C", 60, "z", 9),
    ]
    got = _by_url(recrawl_priority(_log(spark, rows),
                                   url_col="url_hash",
                                   order_cols=("event_id",)))
    a, b, c = got["A"], got["B"], got["C"]
    assert (a.n_fetches, a.n_changes, a.lambda_scaled) == (4, 1, 250000)
    assert (b.n_fetches, b.n_changes, b.lambda_scaled) == (3, 2, 666666)
    assert (c.n_fetches, c.n_changes, c.priority) == (2, 0, 0)
    # now = corpus max ts (400); ages follow
    assert a.age_s == 0 and b.age_s == 100 and c.age_s == 340
    assert a.priority == 0                       # just fetched
    assert b.priority == 666666 * 100
    # the changing stale page outranks everything
    assert b.priority == max(r.priority for r in got.values())


def test_single_fetch_is_not_scheduled(spark):
    got = _by_url(recrawl_priority(
        _log(spark, [("A", 10, "x", 1)]), url_col="url_hash"))
    a = got["A"]
    assert (a.n_fetches, a.n_changes, a.lambda_scaled, a.priority) == \
        (1, 0, 0, 0)


def test_explicit_now(spark):
    rows = [("A", 100, "x", 1), ("A", 200, "y", 2)]
    got = _by_url(recrawl_priority(_log(spark, rows),
                                   url_col="url_hash", now_s=1200))
    assert got["A"].age_s == 1000
    assert got["A"].priority == 500000 * 1000


def test_tie_break_by_order_cols(spark):
    # two fetches at the SAME second: event_id must order them, so
    # x(id=1) -> y(id=2) is one change regardless of input row order
    rows = [("A", 100, "y", 2), ("A", 100, "x", 1)]
    got = _by_url(recrawl_priority(_log(spark, rows),
                                   url_col="url_hash",
                                   order_cols=("event_id",)))
    assert got["A"].n_changes == 1
