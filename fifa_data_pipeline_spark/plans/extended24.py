"""Round-7 anti-entropy + cardinality-sketch operators.

The reference's only integrity surface is BigQuery's own storage
checksums (nothing query-visible; SURVEY.md §2.5); this module
extends the engine-portable fingerprint family (``table_checksum``,
extended23) with the two tools a 100 TB replication/rollup pipeline
actually runs:

- ``q_column_checksums`` — per-COLUMN anti-entropy fingerprints in
  one scan: when two copies of a table disagree, locate WHICH column
  diverged before moving any data (data-diff triage).
- ``q_kmv_distinct`` — KMV k-minimum-values distinct sketch per
  group: the mergeable cardinality sketch with engine-reproducible
  state (min-k md5 hashes), so two engines can cross-verify a
  distinct-count rollup bit-exactly — unlike HLL, whose register
  layouts are implementation-private.

Both DuckDB twins reproduce the md5→BIGINT fold exactly (the same
cross-engine contract the checksum/CMS family established).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fifa_data_pipeline_spark.operators.relational import column_checksums
from fifa_data_pipeline_spark.operators.sketch import (
    _cms_fold_duckdb,
    kmv_distinct,
)
from fifa_data_pipeline_spark.sources.io import read_table

_COLS = ["l_orderkey", "l_suppkey", "l_returnflag", "l_linestatus"]


def q_column_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column XOR-fold fingerprints of four lineitem columns in
    ONE pass — the column-granular data-diff companion to
    ``q_table_checksum`` (same canonicalization: null flag + length
    prefix + md5→BIGINT fold, so the DuckDB twin is bit-exact)."""
    li = read_table(spark, sf_dir, "lineitem")
    return column_checksums(li, _COLS)


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user cardinality via the KMV sketch
    (k=64): sketch state is the 64 smallest 60-bit md5 hashes of
    user_id, estimate = (2^60 / h_k) · 63. The oracle recomputes the
    identical sketch in DuckDB — estimates match bit-for-bit because
    the hash and the IEEE arithmetic order are pinned."""
    ev = read_table(spark, sf_dir, "events")
    return kmv_distinct(ev, "event_type", "user_id", k=64)


def _canon_duck(col: str) -> str:
    """DuckDB canonical form of one field: 0/1 null flag + length
    prefix + value (mirror of column_checksums' Spark expression)."""
    return (
        f"CASE WHEN {col} IS NULL THEN '00:' ELSE "
        f"'1' || CAST(length(CAST({col} AS VARCHAR)) AS VARCHAR) "
        f"|| ':' || CAST({col} AS VARCHAR) END"
    )


QUERIES = {
    "q_column_checksums": q_column_checksums,
    "q_kmv_distinct": q_kmv_distinct,
}

ORACLES = {
    "q_column_checksums": f"""
        SELECT COUNT(*) AS n_rows,
               {", ".join(
                   f"bit_xor({_cms_fold_duckdb(_canon_duck(c))})"
                   f" AS {c}_checksum"
                   for c in _COLS
               )}
        FROM lineitem
    """,
    "q_kmv_distinct": f"""
        WITH h AS (
          SELECT DISTINCT event_type,
                 {_cms_fold_duckdb("CAST(user_id AS VARCHAR)")} AS hh
          FROM events WHERE user_id IS NOT NULL
        ), r AS (
          SELECT event_type, hh,
                 ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY hh) AS rn
          FROM h
        ), s AS (
          SELECT event_type,
                 COUNT(*) AS k_eff,
                 MAX(hh) AS kth_min_hash
          FROM r WHERE rn <= 64
          GROUP BY event_type
        )
        SELECT event_type, k_eff, kth_min_hash,
               CAST(CASE WHEN k_eff < 64 THEN k_eff
                    ELSE FLOOR(1152921504606846976.0
                               / CAST(kth_min_hash AS DOUBLE) * 63.0)
               END AS BIGINT) AS distinct_est
        FROM s
    """,
}
