"""Round-5 batch 1: governance, physical layout, retrieval, and
mergeable-aggregate queries.

- ``q_kanonymity`` — k-anonymity / l-diversity audit over customer
  quasi-identifiers (the governance layer the reference's DDL-embedded
  DQ filters gesture at, `etl_kaggle_to_big_query.py:109,161`).
- ``q_zorder`` — Morton/Z-order interleaved clustering key (the
  OSS stand-in for BigQuery multi-column ``CLUSTER BY``,
  `etl_kaggle_to_big_query.py:90,139`), exact-oracle-checked bit for
  bit against the same expansion in DuckDB.
- ``q_postings`` / ``q_bm25`` — inverted-index build and BM25 top-k
  retrieval over the documents corpus.
- ``q_agg_merge`` — mergeable partial aggregates: two disjoint
  halves aggregated separately, merged by algebraic combination, and
  oracle-checked against the single-pass recompute (the property that
  makes every engine aggregate incrementally maintainable).
- ``q_semantic_dedup`` — SemDeDup-style cluster-then-prune embedding
  dedup (rows-only: k-means cells aren't SQL-expressible; the pytest
  twin verifies the keep/drop invariants vs numpy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fifa_data_pipeline_spark.operators.governance import (
    bucketize,
    k_anonymity_report,
)
from fifa_data_pipeline_spark.operators.layout import (
    morton_code,
    morton_code_sql,
)
from fifa_data_pipeline_spark.operators.retrieval import bm25_topk, inverted_index
from fifa_data_pipeline_spark.operators.vector import semantic_dedup
from fifa_data_pipeline_spark.sources.io import read_table

#: BM25 query bag — frequent corpus terms so every sf has matches.
BM25_TERMS = ["hash", "join", "spark"]


def q_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit: QI = (nation, market segment, account
    balance generalized to 1000-wide bins); sensitive = exact
    balance. Flags QI classes smaller than k=5."""
    cust = read_table(spark, sf_dir, "customer").withColumn(
        "acctbal_bin", bucketize("c_acctbal", 1000)
    )
    return k_anonymity_report(
        cust,
        ["c_nationkey", "c_mktsegment", "acctbal_bin"],
        k=5,
        sensitive_col="c_acctbal",
    )


def q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-order clustering key over two event-derived integer
    axes (user_id and epoch-second, both masked to 10 bits) — the
    multi-column clustering value a Z-ordered writer range-partitions
    on. Exact integer arithmetic end-to-end."""
    ev = read_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    prepared = ev.select(
        "event_id",
        (F.col("user_id") % 1024).cast("bigint").alias("zx"),
        (F.unix_timestamp("ts").cast("bigint") % 1024).alias("zy"),
    )
    return prepared.withColumn("zvalue", morton_code("zx", "zy", bits=10))


def q_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index over the first 200 documents: per token its
    document frequency, total term count, and the sorted posting
    list. The posting list is emitted as a space-joined string of
    ``doc:tf`` entries: the correctness driver's canonicalizer
    cannot sort array-typed cells (pandas ``sort_values`` raises
    ``unhashable type: 'list'`` — r7 `err`), so driver-windowed
    queries emit arrays in scalar form (registry HARD RULE)."""
    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    idx = inverted_index(docs, min_df=3)
    return idx.select(
        "token",
        "df",
        "total_tf",
        F.array_join("postings", " ").alias("postings"),
    )


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 documents for the fixed query bag, deterministic
    (rounded score, doc_id tie-break)."""
    docs = read_table(spark, sf_dir, "documents")
    return bm25_topk(docs, BM25_TERMS, k=20)


def q_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable partial aggregates: split lineitem into two disjoint
    halves (shipdate before/after the corpus midpoint year), compute
    per-(returnflag, half) partial states (n, sum, min, max), then
    merge the halves algebraically. The oracle recomputes in one pass
    — equality IS the mergeability property that incremental
    materialized-view maintenance and every two-phase Spark aggregate
    rely on."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_extendedprice",
        (F.year("l_shipdate") < 1997).cast("int").alias("half"),
    )
    partial = li.groupBy("l_returnflag", "half").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum("l_extendedprice").alias("ps"),
        F.min("l_extendedprice").alias("pmn"),
        F.max("l_extendedprice").alias("pmx"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").cast("long").alias("n"),
        F.round(F.sum("ps"), 2).alias("sum_price"),
        F.round(F.min("pmn"), 2).alias("min_price"),
        F.round(F.max("pmx"), 2).alias("max_price"),
        F.round(F.sum("ps") / F.sum("pn"), 6).alias("avg_price"),
    )


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup cluster-then-prune over embeddings (rows-only: the
    k-means cell boundaries aren't SQL-expressible; pytest verifies
    the keep/drop invariants against numpy). The clustering kernel
    itself is hash-pinned by ``q_kmeans_exact`` (driver-green r5,
    integer-exact fixed-iteration twin), and the cosine pruning by
    ``q_knn_exact`` (driver-green r1-r3)."""
    emb = read_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, threshold=0.5, n_clusters=8)


QUERIES = {
    "q_kanonymity": q_kanonymity,
    "q_zorder": q_zorder,
    "q_postings": q_postings,
    "q_bm25": q_bm25,
    "q_agg_merge": q_agg_merge,
    "q_semantic_dedup": q_semantic_dedup,
}

ORACLES = {
    "q_kanonymity": """
        SELECT c_nationkey, c_mktsegment,
               CAST(FLOOR(c_acctbal / 1000) * 1000 AS BIGINT) AS acctbal_bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT c_acctbal) AS BIGINT) AS l_distinct,
               COUNT(*) < 5 AS at_risk
        FROM customer
        GROUP BY 1, 2, 3
    """,
    "q_zorder": f"""
        WITH prepared AS (
          SELECT event_id,
                 CAST(user_id % 1024 AS BIGINT) AS zx,
                 CAST(floor(epoch(ts)) AS BIGINT) % 1024 AS zy
          FROM events WHERE event_id < 2000
        )
        SELECT event_id, zx, zy,
               {morton_code_sql('zx', 'zy', bits=10)} AS zvalue
        FROM prepared
    """,
    "q_postings": """
        WITH toks AS (
          SELECT doc_id,
                 unnest(string_split_regex(trim(text), '\\s+')) AS token
          FROM documents WHERE doc_id < 200
        ), tf AS (
          SELECT doc_id, token, COUNT(*) AS tf
          FROM toks GROUP BY 1, 2
        )
        SELECT token,
               CAST(COUNT(*) AS BIGINT) AS df,
               CAST(SUM(tf) AS BIGINT) AS total_tf,
               array_to_string(
                 list_sort(list(CAST(doc_id AS VARCHAR) || ':' ||
                                CAST(tf AS VARCHAR))), ' ') AS postings
        FROM tf GROUP BY token
        HAVING COUNT(*) >= 3
    """,
    "q_bm25": f"""
        WITH lens AS (
          SELECT doc_id,
                 len(string_split_regex(trim(text), '\\s+')) AS dl
          FROM documents
        ), stats AS (
          SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM lens
        ), tf AS (
          SELECT doc_id, token, COUNT(*) AS tf FROM (
            SELECT doc_id,
                   unnest(string_split_regex(trim(text), '\\s+')) AS token
            FROM documents
          ) GROUP BY 1, 2
        ), qtf AS (
          SELECT * FROM tf
          WHERE token IN ({", ".join(f"'{t}'" for t in BM25_TERMS)})
        ), dft AS (
          SELECT token, COUNT(*) AS dft FROM qtf GROUP BY token
        ), scored AS (
          SELECT q.doc_id,
                 ROUND(SUM(
                   ln((stats.n_docs - dft.dft + 0.5) / (dft.dft + 0.5) + 1.0)
                   * (q.tf * 2.2)
                   / (q.tf + 1.2 * (1 - 0.75 + 0.75 * lens.dl / stats.avgdl))
                 ), 6) AS bm25
          FROM qtf q
          JOIN dft ON q.token = dft.token
          JOIN lens ON q.doc_id = lens.doc_id
          CROSS JOIN stats
          GROUP BY q.doc_id
        )
        SELECT doc_id, bm25 FROM scored
        ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
    "q_agg_merge": """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(l_extendedprice), 2) AS sum_price,
               ROUND(MIN(l_extendedprice), 2) AS min_price,
               ROUND(MAX(l_extendedprice), 2) AS max_price,
               ROUND(SUM(l_extendedprice) / COUNT(*), 6) AS avg_price
        FROM lineitem GROUP BY l_returnflag
    """,
}
