"""SQL-surface parity & corpus-economics queries (round 4, batch 4):
correlated LATERAL top-n, sequence-length bucketing with padding
waste, and the cross-source duplication matrix.

All oracle-checked; the LATERAL query runs the IDENTICAL SQL text on
both engines (modern-SQL surface parity, like the recursive CTE in
extended9)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fifa_data_pipeline_spark.sources.io import read_table, register_views

#: Shared SQL text for the LATERAL query — Spark ≥3.2 and DuckDB
#: both execute it verbatim (Catalyst decorrelates the LATERAL into
#: a ranked window join; DuckDB into a dependent join).
_LATERAL_SQL = """
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n,
    LATERAL (SELECT c_name, c_acctbal FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_name LIMIT 2) t
"""


def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 customers per nation by
    balance): the modern-SQL dependent-join surface. Catalyst
    DECORRELATES the lateral into a window/limit over one shuffle —
    verify with .explain(): no per-nation re-scan of customer, no
    nested loop — which is exactly why declarative lateral beats a
    hand-written loop at scale."""
    register_views(spark, sf_dir, ["nation", "customer"])
    return spark.sql(_LATERAL_SQL)


def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketing economics: documents grouped into
    power-of-two token-length buckets (min 16), reporting per bucket
    the document count, real token mass, padded mass (bucket size ×
    docs, i.e. what a fixed-shape batch would allocate), and the
    padding waste ratio — the number that decides between bucketed
    batching and sequence packing (`q_seq_pack`). Pure per-row
    arithmetic + one tiny hash aggregate; exact powers of two are FP-
    exact in both engines so the bucket edges can't drift."""
    docs = read_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim("text"), r"\s+")).cast("bigint")
    bucket = F.greatest(
        F.lit(16).cast("bigint"),
        F.pow(F.lit(2.0), F.ceil(F.log2(n_tok))).cast("bigint"),
    )
    per = docs.select(bucket.alias("bucket"), n_tok.alias("__n"))
    return per.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__n").alias("real_tokens"),
        (F.first("bucket") * F.count(F.lit(1))).alias("padded_tokens"),
        F.round(
            1 - F.sum("__n") / (F.first("bucket") * F.count(F.lit(1))), 6
        ).alias("waste_ratio"),
    )


def q_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: for each ordered source pair
    (a, b), how many of a's distinct PREFIX fingerprints (md5 of the
    first 8 tokens — the boilerplate/template-opening signature;
    whole-document hashing finds nothing here because cross-source
    copies are near-dups, not byte dups) also occur in b, and the
    share of a's corpus that overlap represents — the between-sources
    contamination census that decides dedup ORDER (dedup high-overlap
    sources against each other first). One distinct (source, fp)
    projection, one self-join keyed on the fingerprint (each fp meets
    only its own group — no quadratic blowup beyond per-fp source
    counts), one aggregate."""
    docs = read_table(spark, sf_dir, "documents")
    prefix = F.concat_ws(
        " ", F.slice(F.split(F.trim("text"), r"\s+"), 1, 8)
    )
    fp = docs.select("source", F.md5(prefix).alias("fp")).distinct()
    a = fp.select(F.col("source").alias("src_a"), "fp")
    b = fp.select(F.col("source").alias("src_b"), "fp")
    per_src = fp.groupBy("source").agg(F.count(F.lit(1)).alias("__n_a"))
    return (
        a.join(b, "fp")
        .filter(F.col("src_a") != F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .join(
            F.broadcast(per_src.withColumnRenamed("source", "src_a")),
            "src_a",
        )
        .select(
            "src_a",
            "src_b",
            "n_shared",
            F.round(F.col("n_shared") / F.col("__n_a"), 6).alias("share_of_a"),
        )
    )


QUERIES = {
    "q_lateral_topn": q_lateral_topn,
    "q_length_buckets": q_length_buckets,
    "q_cross_source_dups": q_cross_source_dups,
}

ORACLES = {
    "q_lateral_topn": _LATERAL_SQL,
    "q_length_buckets": r"""
        WITH per AS (
          SELECT GREATEST(16, CAST(pow(2, ceil(log2(
                   len(string_split_regex(trim(text), '\s+'))))
                 ) AS BIGINT)) AS bucket,
                 CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                   AS n
          FROM documents
        )
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n) AS BIGINT) AS real_tokens,
               CAST(bucket * COUNT(*) AS BIGINT) AS padded_tokens,
               ROUND(1 - SUM(n) / CAST(bucket * COUNT(*) AS DOUBLE), 6)
                 AS waste_ratio
        FROM per GROUP BY bucket
    """,
    "q_cross_source_dups": """
        WITH fp AS (
          SELECT DISTINCT source,
                 md5(array_to_string(
                   string_split_regex(trim(text), '\\s+')[1:8], ' ')) AS fp
          FROM documents
        ), per_src AS (
          SELECT source, COUNT(*) AS n_a FROM fp GROUP BY source
        )
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared,
               ROUND(COUNT(*) / CAST(MIN(p.n_a) AS DOUBLE), 6) AS share_of_a
        FROM fp a
        JOIN fp b ON a.fp = b.fp AND a.source <> b.source
        JOIN per_src p ON p.source = a.source
        GROUP BY a.source, b.source
    """,
}
