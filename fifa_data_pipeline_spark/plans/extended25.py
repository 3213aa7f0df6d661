"""Round-4 closing additions: exact repeated-span detection — the
substring-level dedup primitive (Lee et al. 2022) that the shingle /
MinHash family (document-level) does not cover.

Reference scope note: the reference pipeline has no text-curation
surface at all (its whole query surface is one Spark job,
``prefect/spark/fifa_spark.py``); this module belongs to the
LLM-training-data extension the build brief makes first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fifa_data_pipeline_spark.operators import dedup as D
from fifa_data_pipeline_spark.sources.io import read_table

_W = 8


def q_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repeated-span exposure at w=8 tokens: how much of
    each document consists of spans that recur verbatim in OTHER
    documents. The thresholdable score for exact-substring curation
    (cut docs past ~30% duplicated spans / trim the spans)."""
    docs = read_table(spark, sf_dir, "documents")
    return D.dup_span_stats(docs, "doc_id", "text", w=_W)


QUERIES = {"q_repeated_spans": q_repeated_spans}

ORACLES = {
    "q_repeated_spans": rf"""
        WITH toks AS (
          SELECT doc_id,
                 string_split_regex(trim(text), '\s+') AS t
          FROM documents
        ), spans AS (
          SELECT doc_id,
                 greatest(len(t) - {_W} + 1, 0) AS n_spans
          FROM toks
        ), grams AS (
          SELECT doc_id, i.i AS pos,
                 array_to_string(t[i.i : i.i + {_W} - 1], ' ') AS gram
          FROM toks, UNNEST(range(1, greatest(len(t) - {_W} + 1, 0) + 1)) AS i(i)
        ), multi AS (
          SELECT gram FROM grams
          GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
        ), dup AS (
          SELECT doc_id, COUNT(*) AS n_dup
          FROM grams JOIN multi USING (gram)
          GROUP BY doc_id
        )
        SELECT s.doc_id,
               CAST(s.n_spans AS BIGINT) AS n_spans,
               CAST(COALESCE(d.n_dup, 0) AS BIGINT) AS n_dup_spans,
               ROUND(CASE WHEN s.n_spans > 0
                          THEN COALESCE(d.n_dup, 0) / CAST(s.n_spans AS DOUBLE)
                          ELSE 0 END, 6) AS dup_ratio
        FROM spans s LEFT JOIN dup d USING (doc_id)
    """,
}
