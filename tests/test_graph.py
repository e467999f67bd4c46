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


def _py_pagerank_redistribute(edges, n_iter, d_num=85, d_den=100,
                              scale=SCALE):
    """Reference recompute of the dangling-redistribution variant."""
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
        d_mass = sum(rank[v] for v in verts if v not in outdeg)
        extra = d_mass * d_num // (d_den * n)
        rank = {v: base + acc[v] + extra for v in verts}
    return rank


def test_pagerank_redistribute_matches_python_recompute(spark):
    """Round-3 verdict item 8: dangling-mass redistribution, exact
    integer parity with the documented arithmetic on a graph with two
    dangling vertices."""
    edges = [(0, 1), (1, 2), (0, 3), (3, 4), (1, 4)]  # 2,4 dangling
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.v: r.rank
           for r in pagerank(df, n_iter=4,
                             dangling="redistribute").collect()}
    assert got == _py_pagerank_redistribute(edges, n_iter=4)


def test_pagerank_redistribute_conserves_mass(spark):
    """With redistribution, total mass stays within floor residue of
    scale (≤ 1 unit per vertex/edge per iteration), where the leak
    variant decays by the whole dangling share."""
    edges = [(0, 1), (1, 2), (2, 3)]  # 3 dangling
    df = spark.createDataFrame(edges, "src long, dst long")
    leak = sum(r.rank for r in pagerank(df, n_iter=5).collect())
    redis = sum(r.rank for r in pagerank(
        df, n_iter=5, dangling="redistribute").collect())
    assert redis > leak
    assert SCALE - redis < 5 * (4 + 3) * 2  # floor residue only
    assert SCALE - leak > SCALE // 20       # the leak is material


def test_pagerank_default_unchanged_by_new_knobs(spark):
    """The oracle twin (q_pagerank) is the leak variant — the new
    knobs must leave the default output bit-identical."""
    edges = [(i, (i * 7 + 3) % 11) for i in range(11)] + [(3, 4)]
    edges = [(u, v) for u, v in edges if u != v]
    assert _run(spark, edges, n_iter=3) == _py_pagerank(edges, n_iter=3)


def test_pagerank_tol_stops_at_fixpoint(spark):
    """Convergence stop: on a fast-converging graph, tol halts before
    n_iter with the same ranks the fully-iterated run produces, and
    stats reports the iteration count + final delta."""
    edges = [(i, (i + 1) % 4) for i in range(4)]  # cycle → immediate
    df = spark.createDataFrame(edges, "src long, dst long")
    stats = {}
    got = {r.v: r.rank
           for r in pagerank(df, n_iter=50, tol=0, stats=stats).collect()}
    assert stats["iters"] < 50
    assert stats["max_delta"] == 0
    full = {r.v: r.rank for r in pagerank(df, n_iter=50).collect()}
    assert got == full


def test_pagerank_bad_dangling_raises(spark):
    import pytest

    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="dangling"):
        pagerank(df, dangling="nope")

# ---------------------------------------------------------------------------
# HITS (hubs & authorities)
# ---------------------------------------------------------------------------

HSCALE = 10 ** 12


def _py_hits(edges, n_iter, scale=HSCALE):
    """Reference recompute of the documented integer HITS arithmetic."""
    edges = sorted(set(edges))
    verts = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(verts)
    hub = {v: scale // n for v in verts}
    auth = {v: 0 for v in verts}
    for _ in range(n_iter):
        raw = {v: 0 for v in verts}
        for u, v in edges:
            raw[v] += hub[u]
        q = max(sum(raw.values()) // scale, 1)
        auth = {v: raw[v] // q for v in verts}
        raw = {v: 0 for v in verts}
        for u, v in edges:
            raw[u] += auth[v]
        q = max(sum(raw.values()) // scale, 1)
        hub = {v: raw[v] // q for v in verts}
    return {v: (hub[v], auth[v]) for v in verts}


def _run_hits(spark, edges, n_iter=3):
    from simplecrawler_spark.operators.graph import hits

    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.v: (r.hub, r.auth) for r in hits(df, n_iter=n_iter).collect()}


def test_hits_matches_python_recompute(spark):
    edges = [(i, (i * 7 + 3) % 11) for i in range(11)] + \
            [(i, (i * 5 + 1) % 11) for i in range(11)] + [(3, 4), (4, 3)]
    edges = [(u, v) for u, v in edges if u != v]
    assert _run_hits(spark, edges, n_iter=4) == _py_hits(edges, n_iter=4)


def test_hits_star_roles(spark):
    """Star: leaves all point at 0 → 0 is THE authority (hub 0 — no
    useful out-links beyond its one back-edge), leaves are the hubs."""
    edges = [(i, 0) for i in range(1, 6)]
    got = _run_hits(spark, edges, n_iter=3)
    assert got[0][1] == max(a for _, a in got.values())   # top authority
    assert got[0][0] == 0                                 # no out-edges
    hubs = {got[i][0] for i in range(1, 6)}
    assert len(hubs) == 1 and hubs.pop() > 0              # symmetric hubs
    assert all(got[i][1] == 0 for i in range(1, 6))       # no in-edges


def test_hits_parallel_edges_count_once(spark):
    a = _run_hits(spark, [(0, 1), (0, 2), (1, 2)], n_iter=3)
    b = _run_hits(spark, [(0, 1), (0, 1), (0, 2), (1, 2)], n_iter=3)
    assert a == b


def test_hits_empty(spark):
    from simplecrawler_spark.operators.graph import hits

    empty = spark.createDataFrame([], "src long, dst long")
    assert hits(empty, n_iter=2).count() == 0


def test_hits_tol_stops_at_fixpoint(spark):
    """hits() gains pagerank's convergence knob: on a fast-converging
    graph tol=0 halts before n_iter with the same (hub, auth) the
    fully-iterated run produces, and stats reports iters/max_delta.
    Defaults (tol=None) stay bit-identical to the oracle twin."""
    from simplecrawler_spark.operators.graph import hits

    edges = [(i, (i + 1) % 4) for i in range(4)]  # cycle → immediate
    df = spark.createDataFrame(edges, "src long, dst long")
    stats = {}
    got = {r.v: (r.hub, r.auth)
           for r in hits(df, n_iter=50, tol=0, stats=stats).collect()}
    assert stats["iters"] < 50
    assert stats["max_delta"] == 0
    full = {r.v: (r.hub, r.auth)
            for r in hits(df, n_iter=50).collect()}
    assert got == full
