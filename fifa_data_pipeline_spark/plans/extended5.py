"""Fifth extended-surface batch: pipeline utilities — deterministic
stratified sampling, histogram binning, single-pass column profiling,
PMI bigram collocations, mergeable HLL sketch rollups, and the
skew-salted join (oracle-proven equal to the plain join).

All but the HLL rollup are DuckDB-oracle-checked; the HLL estimate is
engine-specific (Apache DataSketches HllSketch inside Spark) so it
gets the rows-only check plus an error-bound test vs the exact
distinct count (``test_extended5.py``).

Shared scale posture: sampling/profile/histogram are single-pass
with map-side partials; PMI's joins broadcast the (bounded-vocab)
unigram side; the salted join exists precisely to keep the 100 TB
skewed-key case off one straggler reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fifa_data_pipeline_spark.operators.relational import salted_join
from fifa_data_pipeline_spark.operators.text import tokens
from fifa_data_pipeline_spark.operators.util import exploded
from fifa_data_pipeline_spark.sources.io import read_table, spread


# --- deterministic stratified sampling --------------------------------------

def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample: exactly ``n`` rows per stratum
    (l_returnflag), chosen by MD5-hash order of the unique row key —
    uniform-without-replacement, deterministic across reruns and
    engines (both ship standard MD5), and re-runnable on appended
    data without resampling everything (a row's hash never changes).

    One shuffle on the stratum key; rank-based selection uses the
    WindowGroupLimit pushdown (Spark ≥3.5) so each task keeps only
    its local top-n per stratum before the exchange — shuffle payload
    is O(strata × n), not O(rows). This is the per-stratum analogue
    of systematic_sample (SURVEY §2.5 row).

    The hash is MATERIALIZED as a column before the window: a raw
    expression in a SortOrder is re-evaluated inside the sort
    comparator (~n·log n md5 calls — measured 9s vs 0.4s at sf0.1);
    as a projected column it's computed once per row. ``spread``
    fans the single local parquet split out to all cores so the
    partial (pre-shuffle) top-n sort runs in parallel — at real
    scale inputs already arrive as many splits and it's a no-op."""
    li = spread(
        read_table(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_orderkey", "l_linenumber"
        )
    )
    h = F.md5(F.concat_ws(":", "l_orderkey", "l_linenumber"))
    w = Window.partitionBy("l_returnflag").orderBy(
        "__h", "l_orderkey", "l_linenumber"
    )
    return (
        li.withColumn("__h", h)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 200)
        .select("l_returnflag", "l_orderkey", "l_linenumber")
    )


# --- histogram binning ------------------------------------------------------

def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals: bin index, count, bin
    min/max, and share of total. One hash aggregate; the share is a
    window SUM over the (tiny, #bins-row) aggregate output — the
    global window never touches base data, so the single-partition
    window stage is O(#bins) regardless of input size."""
    orders = read_table(spark, sf_dir, "orders")
    binned = orders.select(
        F.floor(F.col("o_totalprice") / 25000).cast("int").alias("bin"),
        "o_totalprice",
    )
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 6).alias("lo"),
        F.round(F.max("o_totalprice"), 6).alias("hi"),
    )
    return agg.select(
        "bin",
        "n",
        "lo",
        "hi",
        F.round(F.col("n") / F.sum("n").over(Window.partitionBy()), 6).alias(
            "share"
        ),
    )


# --- single-pass column profiling -------------------------------------------

_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]


def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality column profile of orders: per column, non-null
    count and exact distinct count, emitted long-form (one row per
    column). All counts come from ONE aggregate — Catalyst plans the
    multi-column COUNT(DISTINCT) as a single Expand(×5)+aggregate
    pass, not five scans — then a zero-shuffle ``stack`` unpivots the
    1-row result. At 100 TB this is the difference between one read
    of the table and one per profiled column."""
    orders = read_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs.append(F.count(c).alias(f"__n_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__d_{c}"))
    one = orders.agg(*aggs)
    stack = ", ".join(f"'{c}', __n_{c}, __d_{c}" for c in _PROFILE_COLS)
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack}) AS (col_name, n_nonnull, n_distinct)"
        )
    )


# --- PMI bigram collocations ------------------------------------------------

def q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information bigram collocations over the
    corpus: PMI(x,y) = ln( P(x,y) / (P(x)·P(y)) ) with bigram and
    unigram probabilities from corpus counts; kept where the bigram
    occurs ≥ 10 times. The classic collocation-extraction measure
    (Church & Hanks 1990) — a corpus-analysis staple.

    Adjacent pairs are generated per document with NATIVE collection
    functions — ``arrays_zip(toks, slice(toks, 2, …))`` — no lambda
    anywhere in the pair build (no self-join, no shuffle before the
    count aggregates). r6 rewrite of the r5 verdict's 2.6×: the old
    ``transform(sequence(...), i -> struct(element_at, element_at))``
    ran INTERPRETED per element (2.23 s for the build alone at sf1);
    the zip-of-shifted-slice form is wholly JVM-native (0.82 s) and
    took the full query 3.31 → 1.33 s at sf1 — at parity with
    DuckDB's 1.14 s on the same box, bit-identical output. (Also
    measured and rejected: fused single-agg u+b explode 6.3 s,
    packed-string pairs 7.1 s, derived-unigram two-checkpoint chain
    6.1 s — every variant that adds per-element function calls or a
    serialized checkpoint chain loses to removing the lambda.)
    Two wide hash aggregates only (bigram counts, unigram counts);
    the corpus totals are SUMs over those aggregates' outputs —
    vocabulary-sized inputs, so deriving them costs two tiny
    single-partition aggs instead of two more full tokenize+explode
    scans of the corpus. The unigram/total sides are bounded by
    vocabulary size, so everything joins back via broadcast — the
    only wide shuffles are the two counts."""
    docs = read_table(spark, sf_dir, "documents")
    toked = docs.select(tokens("text").alias("__toks"))
    bg = (
        exploded(
            toked,
            F.expr(
                "arrays_zip(__toks,"
                " slice(__toks, 2, greatest(size(__toks) - 1, 0)))"
            ),
            "__p",
        )
        .select(
            F.col("__p.__toks").alias("w1"), F.col("__p.1").alias("w2")
        )
        .filter(F.col("w2").isNotNull())
    )
    uni = exploded(toked, "__toks", "w")
    ucnt = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    nu = ucnt.agg(F.sum("c").alias("__nu"))
    bcnt_all = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    bcnt = bcnt_all.filter(F.col("n_pair") >= 10)
    nb = bcnt_all.agg(F.sum("n_pair").alias("__nb"))
    u1 = ucnt.select(F.col("w").alias("w1"), F.col("c").alias("__c1"))
    u2 = ucnt.select(F.col("w").alias("w2"), F.col("c").alias("__c2"))
    return (
        bcnt.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nu))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(
                F.log(
                    (F.col("n_pair") / F.col("__nb"))
                    / (
                        (F.col("__c1") / F.col("__nu"))
                        * (F.col("__c2") / F.col("__nu"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )


# --- mergeable HLL sketch rollup (rows-only) --------------------------------

def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct customers per order priority AND overall,
    from ONE pass: per-group HllSketch aggregates
    (``hll_sketch_agg``), re-aggregated into the global figure with
    ``hll_union_agg`` — the sketches, not the data, are merged.

    THIS mergeability is the 100 TB story: per-partition /
    per-day sketches are tiny (≲ 1 KB), persistable, and unionable
    after the fact, so rolling 30-day distinct users costs 30 sketch
    unions instead of a 30-day re-scan. Estimates are
    Apache-DataSketches-specific → rows-only check; the error-bound
    test pins estimates within 5% of exact (spec: ~0.8% rse at
    lgConfigK=12), and the exact distinct semantics being
    approximated are hash-pinned by ``q_agg_distinct``
    (driver-windowed r6) on the same tables."""
    orders = read_table(spark, sf_dir, "orders")
    sk = orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("__sk")
    )
    per_group = sk.select(
        "o_orderpriority",
        F.hll_sketch_estimate("__sk").alias("approx_custs"),
    )
    overall = sk.agg(
        F.lit("ALL").alias("o_orderpriority"),
        F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias("approx_custs"),
    )
    return per_group.unionAll(overall)


# --- data-quality audit (constraint checking) -------------------------------

def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit (the deequ/expectations shape):
    uniqueness, non-null, value-range, and referential-integrity
    checks, emitted as one (check_name, n_violations, passed) row per
    constraint — the report a pipeline gates deploys on.

    Cost model: ONE multi-aggregate pass per audited table (all of a
    table's row-level checks fold into a single scan's aggregates;
    the uniqueness check rides the same pass as COUNT − COUNT
    DISTINCT), plus one co-partitioned LEFT ANTI join per FK
    constraint. At 100 TB that is 2 scans + 2 key-shuffles, not one
    scan per check."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    customer = read_table(spark, sf_dir, "customer")

    o_checks = orders.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias(
            "orders_pk_unique"
        ),
        F.count_if(F.col("o_custkey").isNull()).alias("orders_custkey_notnull"),
        F.count_if(F.col("o_totalprice") <= 0).alias("orders_price_positive"),
    )
    l_checks = li.agg(
        F.count_if(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
        ).alias("lineitem_discount_range"),
        F.count_if(F.col("l_quantity") <= 0).alias("lineitem_qty_positive"),
    )
    fk_orders = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("orders_customer_fk"))
    )
    fk_lines = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("lineitem_orders_fk"))
    )

    def rows(df: DataFrame) -> DataFrame:
        names = df.columns
        stack = ", ".join(f"'{c}', {c}" for c in names)
        return df.select(
            F.expr(f"stack({len(names)}, {stack}) AS (check_name, n_violations)")
        )

    report = (
        rows(o_checks)
        .unionAll(rows(l_checks))
        .unionAll(rows(fk_orders))
        .unionAll(rows(fk_lines))
    )
    return report.withColumn("passed", F.col("n_violations") == 0)


# --- skew-salted join (result-identical to plain join) ----------------------

def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority through a SALTED lineitem ⋈ orders
    join — the oracle is the PLAIN join's SQL, which is the point:
    salting is a physical rewrite with identical semantics. See
    ``relational.salted_join`` for when to prefer it over AQE's
    adaptive skew split."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, orders, ["l_orderkey"], salt_buckets=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_extendedprice"), 4).alias("revenue"),
    )


QUERIES = {
    "q_sample_stratified": q_sample_stratified,
    "q_histogram": q_histogram,
    "q_column_profile": q_column_profile,
    "q_pmi_bigrams": q_pmi_bigrams,
    "q_hll_rollup": q_hll_rollup,
    "q_join_salted": q_join_salted,
    "q_dq_checks": q_dq_checks,
}

_TOKS = "string_split_regex(trim(text), '\\s+')"

ORACLES = {
    "q_sample_stratified": """
        SELECT l_returnflag, l_orderkey, l_linenumber
        FROM lineitem
        QUALIFY ROW_NUMBER() OVER (
          PARTITION BY l_returnflag
          ORDER BY md5(CAST(l_orderkey AS VARCHAR) || ':' ||
                       CAST(l_linenumber AS VARCHAR)),
                   l_orderkey, l_linenumber) <= 200
    """,
    "q_histogram": """
        WITH agg AS (
          SELECT CAST(FLOOR(o_totalprice / 25000) AS INTEGER) AS bin,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(MIN(o_totalprice), 6) AS lo,
                 ROUND(MAX(o_totalprice), 6) AS hi
          FROM orders GROUP BY bin
        )
        SELECT bin, n, lo, hi,
               ROUND(n / SUM(n) OVER (), 6) AS share
        FROM agg
    """,
    "q_column_profile": """
        SELECT 'o_orderkey' AS col_name,
               CAST(COUNT(o_orderkey) AS BIGINT) AS n_nonnull,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct
        FROM orders
        UNION ALL
        SELECT 'o_custkey', COUNT(o_custkey), COUNT(DISTINCT o_custkey) FROM orders
        UNION ALL
        SELECT 'o_orderstatus', COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus) FROM orders
        UNION ALL
        SELECT 'o_totalprice', COUNT(o_totalprice), COUNT(DISTINCT o_totalprice) FROM orders
        UNION ALL
        SELECT 'o_orderpriority', COUNT(o_orderpriority), COUNT(DISTINCT o_orderpriority) FROM orders
    """,
    "q_pmi_bigrams": f"""
        WITH t AS (
          SELECT {_TOKS} AS toks FROM documents
        ), uni AS (
          SELECT unnest(toks) AS w FROM t
        ), ucnt AS (
          SELECT w, COUNT(*) AS c FROM uni GROUP BY w
        ), nu AS (
          SELECT COUNT(*) AS n FROM uni
        ), bgs AS (
          SELECT unnest(list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i + 1])) AS bg
          FROM t
        ), bcnt AS (
          SELECT string_split(bg, ' ')[1] AS w1,
                 string_split(bg, ' ')[2] AS w2,
                 CAST(COUNT(*) AS BIGINT) AS n_pair
          FROM bgs GROUP BY w1, w2 HAVING COUNT(*) >= 10
        ), nb AS (
          SELECT COUNT(*) AS n FROM bgs
        )
        SELECT b.w1, b.w2, b.n_pair,
               ROUND(ln((b.n_pair / nb.n) /
                        ((u1.c / nu.n) * (u2.c / nu.n))), 6) AS pmi
        FROM bcnt b
        JOIN ucnt u1 ON u1.w = b.w1
        JOIN ucnt u2 ON u2.w = b.w2
        CROSS JOIN nb CROSS JOIN nu
    """,
    "q_dq_checks": """
        WITH r AS (
          SELECT 'orders_pk_unique' AS check_name,
                 CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_violations
          FROM orders
          UNION ALL
          SELECT 'orders_custkey_notnull',
                 CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) FROM orders
          UNION ALL
          SELECT 'orders_price_positive',
                 CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT) FROM orders
          UNION ALL
          SELECT 'lineitem_discount_range',
                 CAST(COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 1) AS BIGINT) FROM lineitem
          UNION ALL
          SELECT 'lineitem_qty_positive',
                 CAST(COUNT(*) FILTER (WHERE l_quantity <= 0) AS BIGINT) FROM lineitem
          UNION ALL
          SELECT 'orders_customer_fk',
                 CAST(COUNT(*) AS BIGINT) FROM orders
          WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
          UNION ALL
          SELECT 'lineitem_orders_fk',
                 CAST(COUNT(*) AS BIGINT) FROM lineitem
          WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        )
        SELECT check_name, n_violations, n_violations = 0 AS passed FROM r
    """,
    "q_join_salted": """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               ROUND(SUM(l_extendedprice), 4) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
}
