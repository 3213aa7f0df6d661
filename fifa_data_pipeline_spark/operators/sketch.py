"""Streaming-summary sketch operators (Misra–Gries heavy hitters).

The reference has no sketch surface at all (SURVEY.md §2.5); this
module adds the frequent-items family next to the HLL cardinality
sketches in plans/extended5.py. The design point is the two-pass
sketch-then-verify shape that stays EXACT:

1. **Sketch pass** — each partition runs a Misra–Gries summary with
   ``k`` counters over its rows (``mapInPandas``, Arrow-batched; O(k)
   memory per task regardless of partition size). MG's guarantee:
   every item with partition frequency > n_p/(k+1) survives the
   partition's summary, so every item with GLOBAL frequency >
   N/(k+1) survives in at least one partition (if it fell below the
   local bar everywhere, summing the bars bounds it below the global
   bar). The union of per-partition candidates is therefore a
   guaranteed superset of the true heavy hitters — at most
   k × partitions rows, i.e. KBs at any input scale.
2. **Verify pass** — one fused recount: candidates keep their item
   as the aggregate key, everything else collapses onto a NULL
   sentinel, so a single hash aggregate yields both the exact
   candidate counts AND the exact total N; a strict
   ``count > N/(k+1)`` filter finishes. The output is bit-identical
   to the brute-force ``GROUP BY … HAVING`` answer, which is what
   the DuckDB oracle runs.

At 100 TB the brute-force form shuffles one row per distinct item
(billions for web-scale token vocabularies); the sketch form
shuffles ≤ k rows per partition plus a counted broadcast — the
classic heavy-hitters win, with zero accuracy loss after the verify
recount.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fifa_data_pipeline_spark.operators.util import pin


def misra_gries_candidates(
    items: DataFrame, item_col: str, k: int
) -> DataFrame:
    """Per-partition Misra–Gries summaries, unioned and deduped.

    Returns a DataFrame with the single column ``item_col`` holding
    every item that survived at least one partition's k-counter
    summary — a superset of all items with global frequency >
    N/(k+1). NULL items are ignored (SQL COUNT semantics)."""

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Batch-merge variant of Misra-Gries (Agarwal et al. 2012,
        # "Mergeable Summaries"): each Arrow batch's EXACT counts
        # (``value_counts`` — C speed, no per-row Python) merge into
        # the running summary; pruning back to k counters subtracts
        # the (k+1)-th largest count from every counter and drops the
        # non-positive ones. The merged summary keeps MG's bound
        # (total undercount <= n/(k+1)), so the superset guarantee is
        # unchanged, while memory stays O(k + batch-distinct) — the
        # batch size bounds it, not the partition size.
        counters: dict = {}
        for pdf in batches:
            for item, c in pdf[item_col].value_counts(dropna=True).items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                bar = sorted(counters.values(), reverse=True)[k]
                counters = {
                    i: c - bar for i, c in counters.items() if c > bar
                }
        yield pd.DataFrame({item_col: list(counters.keys())})

    schema = items.select(item_col).schema
    return (
        items.select(item_col)
        .mapInPandas(mg, schema)
        .distinct()
    )


def heavy_hitters_exact(
    items: DataFrame, item_col: str, k: int
) -> DataFrame:
    """Exact frequent-items query, sketch-accelerated: all items with
    frequency strictly greater than N/(k+1), with their EXACT counts
    — identical output to the brute-force GROUP BY/HAVING, but the
    wide shuffle carries only Misra–Gries survivors instead of the
    full distinct-item set.

    The whole query is TWO scans of the input — the sketch pass and
    one fused recount pass: non-candidate rows collapse onto a NULL
    sentinel key in the same hash aggregate that counts candidates
    (map-side partials keep the sentinel group one row per task, so
    it cannot skew), which yields the exact total N for free instead
    of a third counting scan. The tiny intermediates (candidate set,
    per-key counts) are ``localCheckpoint``-ed so their downstream
    double-use cannot re-trigger the big scans."""
    cands = misra_gries_candidates(items, item_col, k).transform(pin("sketch"))
    marked = (
        items.filter(F.col(item_col).isNotNull())
        .join(
            F.broadcast(cands.withColumn("__is_cand", F.lit(True))),
            item_col,
            "left",
        )
        .select(
            F.when(F.col("__is_cand"), F.col(item_col)).alias("__key")
        )
    )
    counts = (
        marked.groupBy("__key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .transform(pin("sketch"))
    )
    total = counts.agg(F.sum("cnt").alias("__total"))
    return (
        counts.filter(F.col("__key").isNotNull())
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * (k + 1) > F.col("__total"))
        .select(F.col("__key").alias(item_col), "cnt")
    )


# ---------------------------------------------------------------------------
# Count-min sketch (deterministic md5 hash family)
# ---------------------------------------------------------------------------

def _cms_fold_spark(key_expr: str) -> str:
    """Spark SQL: ONE 60-bit md5 fold of the key (the engine's
    portable hash — same construction as hash_split/spatial grid).
    All ``depth`` bucket indices derive from disjoint 10-bit slices
    of this single fold — the md5-per-(depth × row) variant cost
    d× the per-row hash work for identical CMS guarantees
    (est ≥ true holds for ANY hash family; the slices of one strong
    hash are the standard cheap stand-in for d independent hashes)."""
    return (
        f"CAST(conv(substring(md5({key_expr}), 1, 15), 16, 10) AS BIGINT)"
    )


def _cms_fold_duckdb(key_expr: str) -> str:
    """DuckDB twin of :func:`_cms_fold_spark`."""
    return (
        "list_reduce(list_transform(range(1, 16), "
        "j -> CAST(strpos('0123456789abcdef', "
        f"substr(md5({key_expr}), j, 1)) - 1 AS BIGINT)), "
        "(a, b) -> a * 16 + b)"
    )


def _cms_buckets(key_col: str, depth: int, width: int):
    """Array of per-depth bucket indices sliced from ONE shared fold:
    the three expression trees are IDENTICAL below the div, so
    whole-stage-codegen's common-subexpression elimination computes
    the md5 once per row (the old per-depth salt defeated CSE by
    construction). Wall clock at sf0.1 is tokenization-bound either
    way; the win is per-row hash work at scale."""
    fold = _cms_fold_spark(key_col)
    return F.array(
        *[
            F.expr(f"({fold}) div {width ** d} % {width}")
            for d in range(depth)
        ]
    )


def cms_build(
    items: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Count-min sketch as a DataFrame: one row per non-empty
    (depth, bucket) cell with its count. The hash family is the
    deterministic md5 fold salted by the depth index, so the sketch
    is reproducible across engines and runs (no JVM hash seeds).

    The build is a single hash aggregate over depth × n rows
    (posexplode of the per-row bucket array); the result is at most
    ``depth × width`` rows — KBs at ANY input scale, and mergeable
    across shards/days by summing cell counts (the property the
    oracle's single-pass twin verifies indirectly: estimates depend
    only on cell sums). The explode goes through the outer-generate
    idiom (`util.exploded`): a plain inner posexplode would trigger
    ``InferFiltersFromGenerate`` and evaluate the depth×md5 bucket
    array two extra times per row, interpreted (see util.exploded).
    """
    from fifa_data_pipeline_spark.operators.util import exploded

    return (
        exploded(items, _cms_buckets(key_col, depth, width), "bucket",
                 pos_alias="d")
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate probe keys against a CMS: est(key) = min over
    depths of the key's cell count (0 when a cell is empty). The CMS
    guarantee — est ≥ true, with overshoot bounded by collisions —
    is asserted by the oracle pairing (the query also carries the
    exact count).

    The probe side is tiny (a literal key list) → broadcast; the CMS
    is ≤ depth×width rows → also broadcast-sized. No wide shuffle at
    any scale.
    """
    probe_cells = probes.select(
        F.col(key_col),
        F.posexplode(_cms_buckets(key_col, depth, width)).alias(
            "d", "bucket"
        ),
    )
    return (
        probe_cells.join(F.broadcast(cms), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est"))
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per group — the
    mergeable cardinality sketch whose state is just the ``k``
    smallest hash values seen (Bar-Yossef et al. RANDOM'02; the
    order-statistics cousin of HLL). With values hashed uniformly
    into [0, 2^60), the k-th smallest hash ``h_k`` estimates density:
    ``distinct ≈ (k-1) · 2^60 / h_k``; groups with fewer than ``k``
    distinct hashes report their EXACT distinct count.

    Engine-portable by construction: the hash is the same md5→BIGINT
    fold as the CMS/checksum family, so the DuckDB twin reproduces
    every sketch — and therefore every estimate — bit-exactly (the
    estimate arithmetic is ordered to be IEEE-identical across
    engines: (2^60 / h_k) · (k-1), both factors exact doubles).

    Plan shape: distinct (group, hash) → one window rank per group →
    per-group max/count over the ≤ k survivors. The shuffle carries
    distinct hashes only; at 100 TB the sketch property that matters
    is MERGEABILITY — per-partition min-k sets union and re-take
    min-k, which is exactly what the rank-then-aggregate computes,
    and partial aggregation keeps map outputs at O(k · groups).

    Returns ``(group, k_eff, kth_min_hash, distinct_est)``.
    """
    from pyspark.sql import Window

    h = F.expr(
        f"CAST(conv(substring(md5(CAST(`{value_col}` AS STRING)), 1, 15),"
        " 16, 10) AS BIGINT)"
    )
    hashed = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col), h.alias("__h"))
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("__h")
    topk = hashed.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    space = float(2**60)  # exact double (power of two)
    return (
        topk.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("k_eff"),
            F.max("__h").alias("kth_min_hash"),
        )
        .withColumn(
            "distinct_est",
            F.when(F.col("k_eff") < k, F.col("k_eff")).otherwise(
                F.floor(
                    F.lit(space)
                    / F.col("kth_min_hash").cast("double")
                    * F.lit(float(k - 1))
                )
            ).cast("bigint"),
        )
    )
