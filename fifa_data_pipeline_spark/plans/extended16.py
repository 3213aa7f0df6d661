"""Round-5 batch 2: sketch estimation and bloom-pruned joins.

- ``q_cms_counts`` — count-min-sketch point estimates for a probe
  token set, carried next to the exact counts. The md5 hash family
  is engine-portable, so the ENTIRE sketch (cells, estimates,
  overcounts) is exact-oracle-checked — DuckDB rebuilds the same
  sketch and must land on identical estimates.
- ``q_bloom_join`` — bloom-filter-pruned semi-join: dim keys folded
  to a broadcastable bit table, fact pruned map-side, exact verify
  after. No false negatives → result equals the plain semi-join the
  oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fifa_data_pipeline_spark.operators.relational import bloom_pruned_semi_join
from fifa_data_pipeline_spark.operators.sketch import cms_build, cms_estimate
from fifa_data_pipeline_spark.operators.text import tokens
from fifa_data_pipeline_spark.operators.util import exploded
from fifa_data_pipeline_spark.sources.io import read_table

#: CMS probe keys: four frequent corpus tokens + one absent (its
#: estimate exposes pure collision overcount, possibly 0).
CMS_PROBES = ["join", "hash", "spark", "window", "zzz_absent"]
CMS_DEPTH = 3
CMS_WIDTH = 1024

#: DuckDB twin of the engine's single shared md5 fold; per-depth
#: buckets are disjoint 10-bit slices (fold // width^d % width).
_FOLD = (
    "list_reduce(list_transform(range(1, 16), "
    "j -> CAST(strpos('0123456789abcdef', "
    "substr(md5(token), j, 1)) - 1 "
    "AS BIGINT)), (a, b) -> a * 16 + b)"
)


def q_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS point estimates vs exact counts for the probe tokens over
    the documents token stream (depth 3 × width 1024)."""
    docs = read_table(spark, sf_dir, "documents")
    # spread before the explode: the tokenize + per-token md5 fold is
    # the dominant stage and runs inside the scan task — a single-
    # split local file serializes it onto one core (measured −40% at
    # sf0.1; no-op at production split counts)
    from fifa_data_pipeline_spark.sources.io import spread

    toks = exploded(spread(docs), tokens("text"), "token")
    cms = cms_build(toks, "token", CMS_DEPTH, CMS_WIDTH)
    probes = spark.createDataFrame([(t,) for t in CMS_PROBES], ["token"])
    est = cms_estimate(cms, probes, "token", CMS_DEPTH, CMS_WIDTH)
    true_counts = (
        toks.filter(F.col("token").isin(*CMS_PROBES))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
    )
    return (
        est.join(true_counts, "token", "left")
        .select(
            "token",
            "est",
            F.coalesce("true_cnt", F.lit(0)).cast("long").alias("true_cnt"),
            (F.col("est") - F.coalesce("true_cnt", F.lit(0)))
            .cast("long")
            .alias("overcount"),
        )
    )


def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders from high-balance customers (bloom-pruned semi-join),
    aggregated per order priority."""
    orders = read_table(spark, sf_dir, "orders")
    rich = read_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal") > 9000
    )
    matched = bloom_pruned_semi_join(
        orders, rich, "o_custkey", "c_custkey", m=4096, n_hashes=2
    )
    return matched.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


QUERIES = {
    "q_cms_counts": q_cms_counts,
    "q_bloom_join": q_bloom_join,
}

_PROBE_VALUES = ", ".join(f"('{t}')" for t in CMS_PROBES)

ORACLES = {
    "q_cms_counts": f"""
        WITH toks AS (
          SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
          FROM documents
        ), cells AS (
          SELECT d, bucket, COUNT(*) AS cnt FROM (
            SELECT r.d AS d,
                   (({_FOLD}) // CAST(pow({CMS_WIDTH}, r.d) AS BIGINT))
                     % {CMS_WIDTH} AS bucket
            FROM toks, range(0, {CMS_DEPTH}) r(d)
          ) GROUP BY 1, 2
        ), probe_cells AS (
          SELECT token, r.d AS d,
                 (({_FOLD}) // CAST(pow({CMS_WIDTH}, r.d) AS BIGINT))
                   % {CMS_WIDTH} AS bucket
          FROM (VALUES {_PROBE_VALUES}) p(token), range(0, {CMS_DEPTH}) r(d)
        ), est AS (
          SELECT token, MIN(COALESCE(cnt, 0)) AS est
          FROM probe_cells pc
          LEFT JOIN cells USING (d, bucket)
          GROUP BY token
        ), true_c AS (
          SELECT token, COUNT(*) AS tc FROM toks
          WHERE token IN ({", ".join(f"'{t}'" for t in CMS_PROBES)})
          GROUP BY token
        )
        SELECT e.token,
               CAST(e.est AS BIGINT) AS est,
               CAST(COALESCE(t.tc, 0) AS BIGINT) AS true_cnt,
               CAST(e.est - COALESCE(t.tc, 0) AS BIGINT) AS overcount
        FROM est e LEFT JOIN true_c t ON e.token = t.token
    """,
    "q_bloom_join": """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM orders
        WHERE o_custkey IN (
          SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        )
        GROUP BY o_orderpriority
    """,
}
