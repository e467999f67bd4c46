"""Link-graph analytics: PageRank + HITS over the crawl's hyperlinks.

The reference schedules FIFO (crawler.py:81 `queue.Queue`); the
engine's G6 priority sources (in-degree / host-rank / depth,
plans/crawl.py) are per-round signals. PageRank is the OFFLINE
refinement of the same idea: computed over the accumulated link
table between crawls, its scores join onto the frontier as a
`priority` column (CrawlConfig.priority_source consumes any numeric
priority; see plans/crawl.py:458).

Engine-portable integer arithmetic: ranks are int64 masses out of
``scale`` (default 10^15), damping is the exact rational
``d_num/d_den`` (85/100), and every division is INTEGER division
(Spark `div`, DuckDB `//`). Float PageRank cannot be oracle-checked —
cross-row float addition order differs between engines and between
runs of the same engine; integer masses make q_pagerank exact.
Headroom: contributions compute rank·d_num ≤ 10^15·85 < 2^63.

Semantics (documented, pinned by tests):
  * vertices = distinct(src) ∪ distinct(dst);
  * initial rank = scale // N per vertex;
  * per iteration, v's new rank =
        scale·(d_den−d_num) // (d_den·N)                (base mass)
      + Σ_{u→v} rank(u)·d_num // (d_den·outdeg(u))      (link mass)
  * dangling vertices (no out-edges): ``dangling="leak"`` (default,
    the q_pagerank oracle twin) lets their mass decay — the standard
    simple variant; floor divisions leak O(1) units per edge. Total
    mass therefore decays slightly; RANKING is what the priority
    consumer uses. ``dangling="redistribute"`` adds the classic
    correction: each iteration sums the dangling vertices' mass D
    (one 1-row aggregate crossJoined back — never a driver collect)
    and every vertex receives D·d_num // (d_den·N) extra, so total
    mass stays ≈ scale (up to floor residue). Headroom still holds:
    link mass + dangling share ≤ rank totals ≤ scale, so products
    stay < 10^15·85 < 2^63.
  * parallel edges count once (edges are distinct-ed).
  * ``tol`` (int mass units, optional) stops early once
    max_v |rank_t(v) − rank_{t−1}(v)| ≤ tol — the fixpoint test is
    one map-side-combinable max aggregate per iteration (a scalar to
    the driver; PageRank iterations are global barriers anyway).
    Integer masses make the fixpoint exact and engine-portable where
    a float L1 test would not be. ``stats`` (caller-supplied dict)
    receives {"iters", "max_delta"} for observability.

Scale shape: each iteration is exactly one join of the rank table to
the edge table on src (both re-shuffle on the same key every round —
at cluster scale pre-bucket both by src and the join is co-located)
plus one map-side-combinable groupBy(dst) sum; the N-row rank frame
is localCheckpoint-ed per iteration so lineage stays flat (same
discipline as dedup.connected_components). Nothing per-vertex ever
reaches the driver. The edge/outdeg/vertex frames are re-derived per
iteration — callers running many iterations over a large graph should
persist (or better, bucket-by-src) ``edges`` before calling; the
operator deliberately owns no cache lifecycle (round-2 ADVICE:
operators must not leak persisted blocks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "hits"]


def pagerank(edges: DataFrame, n_iter: int = 10,
             d_num: int = 85, d_den: int = 100,
             src: str = "src", dst: str = "dst",
             scale: int = 10 ** 15,
             dangling: str = "leak",
             tol: int | None = None,
             stats: dict | None = None) -> DataFrame:
    """Integer-mass PageRank over ``edges``; returns
    (v, rank) with rank an int64 share of ``scale``. See module
    docstring for the exact arithmetic, the ``dangling`` variants and
    the ``tol`` fixpoint stop."""
    if dangling not in ("leak", "redistribute"):
        raise ValueError(
            f"dangling must be 'leak' or 'redistribute', got {dangling!r}")
    e = edges.select(F.col(src).alias("src"),
                     F.col(dst).alias("dst")).distinct()
    verts = (e.select(F.col("src").alias("v"))
             .unionByName(e.select(F.col("dst").alias("v")))
             .distinct())
    # one tiny agg: N and the constant masses ride into the plan as
    # literals (never a per-vertex driver collect)
    n = verts.count()
    if n == 0:
        if stats is not None:
            stats.update(iters=0, max_delta=0)
        return verts.withColumn("rank", F.lit(0).cast("long"))
    init = scale // n
    base = (scale * (d_den - d_num)) // (d_den * n)
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    ranks = verts.withColumn("rank", F.lit(init).cast("long"))
    iters_run, max_delta = 0, None
    for _ in range(n_iter):
        contrib = (
            ranks.join(e, ranks["v"] == e["src"])
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("v"),
                F.expr(f"rank * {d_num} div ({d_den} * outdeg)")
                .alias("c"))
            .groupBy("v").agg(F.sum("c").alias("c")))
        extra = F.lit(0)
        if dangling == "redistribute":
            # D = Σ rank over vertices with no out-edge; a 1-row
            # aggregate crossJoined back in (broadcast-trivial), so the
            # correction never round-trips the driver
            d_mass = (ranks.join(
                outdeg.select(F.col("src").alias("v")), "v", "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0))
                     .cast("long").alias("_dm")))
            extra = F.expr(f"_dm * {d_num} div ({d_den} * {n})")
        new_ranks = verts.join(contrib, "v", "left")
        if dangling == "redistribute":
            new_ranks = new_ranks.crossJoin(F.broadcast(d_mass))
        new_ranks = (new_ranks
                     .select("v",
                             (F.lit(base)
                              + F.coalesce(F.col("c"), F.lit(0))
                              + extra)
                             .cast("long").alias("rank"))
                     .localCheckpoint(eager=tol is not None))
        iters_run += 1
        if tol is not None:
            max_delta = (
                new_ranks.alias("a")
                .join(ranks.alias("b"), "v")
                .agg(F.coalesce(
                    F.max(F.abs(F.col("a.rank") - F.col("b.rank"))),
                    F.lit(0)).alias("d"))
                .first()["d"])
            ranks = new_ranks
            if max_delta <= tol:
                break
        else:
            ranks = new_ranks
    if stats is not None:
        stats.update(iters=iters_run, max_delta=max_delta)
    return ranks


def hits(edges: DataFrame, n_iter: int = 5,
         src: str = "src", dst: str = "dst",
         scale: int = 10 ** 12, tol: int | None = None,
         stats: dict | None = None) -> DataFrame:
    """Integer-mass HITS (Kleinberg hubs & authorities) over
    ``edges``; returns (v, hub, auth) with both scores int64 shares
    of roughly ``scale``.

    Crawl role: authorities rank pages worth RE-fetching/keeping
    (content hubs link to them); hubs rank pages worth re-PARSING
    (their link lists discover the most authorities). Either column
    feeds CrawlConfig.priority_source exactly like pagerank's rank.
    Reference analogue: none — the reference schedules FIFO
    (crawler.py:81); this is the offline refinement, same as
    ``pagerank`` above.

    Engine-portable integer arithmetic (the q_hits oracle unrolls the
    identical steps in DuckDB):

      * vertices = distinct(src) ∪ distinct(dst); parallel edges
        count once; initial hub = ``scale // N`` per vertex.
      * per iteration:
          auth_raw(v) = Σ_{u→v} hub(u)
          auth(v)     = auth_raw(v) // max(Σ auth_raw // scale, 1)
          hub_raw(u)  = Σ_{u→v} auth(v)        (the NEW auth)
          hub(u)      = hub_raw(u) // max(Σ hub_raw // scale, 1)
        — L1 normalisation by a floored integer quotient instead of
        float division, so every value stays int64 and the
        cross-engine comparison is exact (float HITS cannot be
        hash-gated: see the pagerank module docstring).
      * vertices with no in-edges hold auth=0; no out-edges → hub=0.
      * ``tol`` (int mass units, optional — the pagerank fixpoint
        knob): stop once max_v |hub_t(v) − hub_{t−1}(v)| ≤ tol after
        a full auth+hub step; n_iter stays the hard bound. Pass
        ``stats`` to read back iters/max_delta.

    Overflow headroom: after each normalisation Σ score ≲ scale, so
    raw sums are ≤ scale·max_degree; scale 10^12 is safe for degrees
    < 9·10^6 (document/raise scale down for denser graphs).

    Scale shape: each iteration is two shuffles — join scores to
    edges on one key + a map-side-combinable sum on the other — and
    two 1-row aggregates that ride back in as broadcast crossJoins
    (never a per-vertex driver collect). Scores localCheckpoint per
    iteration, keeping lineage flat (same discipline as pagerank /
    connected_components). Pre-bucket ``edges`` by src for co-located
    iterations at cluster scale.
    """
    e = edges.select(F.col(src).alias("src"),
                     F.col(dst).alias("dst")).distinct()
    verts = (e.select(F.col("src").alias("v"))
             .unionByName(e.select(F.col("dst").alias("v")))
             .distinct())
    n = verts.count()
    if n == 0:
        return (verts.withColumn("hub", F.lit(0).cast("long"))
                .withColumn("auth", F.lit(0).cast("long")))
    hub = verts.withColumn("hub", F.lit(scale // n).cast("long"))
    auth = None
    iters_run, max_delta = 0, None
    for _ in range(n_iter):
        auth_raw = (hub.join(e, hub["v"] == e["src"])
                    .groupBy(F.col("dst").alias("av"))
                    .agg(F.sum("hub").alias("raw")))
        auth = (verts.join(auth_raw, verts["v"] == F.col("av"), "left")
                .crossJoin(F.broadcast(
                    auth_raw.agg(F.coalesce(F.sum("raw"), F.lit(0))
                                 .cast("long").alias("_sa"))))
                .select("v",
                        F.expr(f"coalesce(raw, 0) div "
                               f"greatest(_sa div {scale}, 1)")
                        .cast("long").alias("auth"))
                .localCheckpoint(eager=False))
        hub_raw = (auth.join(e, auth["v"] == e["dst"])
                   .groupBy(F.col("src").alias("hv"))
                   .agg(F.sum("auth").alias("raw")))
        new_hub = (verts.join(hub_raw, verts["v"] == F.col("hv"), "left")
               .crossJoin(F.broadcast(
                   hub_raw.agg(F.coalesce(F.sum("raw"), F.lit(0))
                               .cast("long").alias("_sh"))))
               .select("v",
                        F.expr(f"coalesce(raw, 0) div "
                               f"greatest(_sh div {scale}, 1)")
                        .cast("long").alias("hub"))
               .localCheckpoint(eager=tol is not None))
        iters_run += 1
        if tol is not None:
            max_delta = (
                new_hub.alias("a").join(hub.alias("b"), "v")
                .agg(F.coalesce(
                    F.max(F.abs(F.col("a.hub") - F.col("b.hub"))),
                    F.lit(0)).alias("d"))
                .first()["d"])
            hub = new_hub
            if max_delta <= tol:
                break
        else:
            hub = new_hub
    if stats is not None:
        stats.update(iters=iters_run, max_delta=max_delta)
    return hub.join(auth, "v")
