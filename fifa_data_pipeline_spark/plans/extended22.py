"""Round-5 batch 8: polymorphic UDTF over TABLE arguments.

- ``q_udtf_topk`` — top-k docs per source via a UDTF consuming
  ``TABLE(...) PARTITION BY`` (Spark ≥3.5): the aggregate-shaped
  Python table function with O(k) state per partition. Oracle is the
  row_number window — proving the two forms coincide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fifa_data_pipeline_spark.operators.tablefuncs import (
    TOPK_K,
    topk_per_source,
)
from fifa_data_pipeline_spark.sources.io import read_table


def q_udtf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 longest documents per source through the TABLE-argument
    UDTF path (bounded per-partition Python state)."""
    docs = read_table(spark, sf_dir, "documents")
    return topk_per_source(spark, docs)


QUERIES = {"q_udtf_topk": q_udtf_topk}

ORACLES = {
    "q_udtf_topk": f"""
        WITH ranked AS (
          SELECT doc_id, source, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY n_chars DESC, doc_id) AS rank
          FROM documents
        )
        SELECT doc_id, source, n_chars, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= {TOPK_K}
    """,
}
