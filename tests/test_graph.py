"""PageRank over link edges (operators/graph.py): integer-mass
semantics, structure sanity, and a pure-python parity recompute."""

from __future__ import annotations

from simplecrawler_spark.operators.graph import pagerank

SCALE = 10 ** 15


def _py_pagerank(edges, n_iter, d_num=85, d_den=100, scale=SCALE):
    """Reference recompute of the documented integer arithmetic."""
    edges = sorted(set(edges))
    verts = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(verts)
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    rank = {v: scale // n for v in verts}
    base = (scale * (d_den - d_num)) // (d_den * n)
    for _ in range(n_iter):
        acc = {v: 0 for v in verts}
        for u, v in edges:
            acc[v] += rank[u] * d_num // (d_den * outdeg[u])
        rank = {v: base + acc[v] for v in verts}
    return rank


def _run(spark, edges, n_iter=3):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.v: r.rank for r in pagerank(df, n_iter=n_iter).collect()}


def test_pagerank_star_hub_dominates(spark):
    edges = [(i, 0) for i in range(1, 6)] + [(0, 1)]
    got = _run(spark, edges)
    assert got[0] == max(got.values())
    # leaves 2..5 are symmetric (leaf 1 also receives the hub's edge)
    assert len({got[i] for i in range(2, 6)}) == 1


def test_pagerank_cycle_uniform(spark):
    edges = [(i, (i + 1) % 4) for i in range(4)]
    got = _run(spark, edges)
    assert len(set(got.values())) == 1


def test_pagerank_matches_python_recompute(spark):
    edges = [(i, (i * 7 + 3) % 11) for i in range(11)] + \
            [(i, (i * 5 + 1) % 11) for i in range(11)] + [(3, 4), (4, 3)]
    edges = [(u, v) for u, v in edges if u != v]
    got = _run(spark, edges, n_iter=4)
    want = _py_pagerank(edges, n_iter=4)
    assert got == want


def test_pagerank_dangling_and_empty(spark):
    # vertex 2 has no out-edges: its mass leaks (documented variant)
    got = _run(spark, [(0, 1), (1, 2)])
    assert set(got) == {0, 1, 2}
    assert sum(got.values()) < SCALE
    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty, n_iter=2).count() == 0
