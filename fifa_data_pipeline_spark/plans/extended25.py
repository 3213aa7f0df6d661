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


def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprint candidate pairs: docs sharing >= 2
    window-min gram-hash fingerprints, fingerprint-bucketed (never
    all-pairs) with the band-guard discipline on degenerate
    boilerplate fingerprints. The DuckDB twin reproduces the 60-bit
    md5 fold and the window-min selection bit-exactly."""
    docs = read_table(spark, sf_dir, "documents")
    return D.winnow_pairs(docs, "doc_id", "text", k=5, window=4,
                          min_shared=2, max_bucket=50)


def q_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repeated-span exposure at w=8 tokens: how much of
    each document consists of spans that recur verbatim in OTHER
    documents. The thresholdable score for exact-substring curation
    (cut docs past ~30% duplicated spans / trim the spans)."""
    docs = read_table(spark, sf_dir, "documents")
    return D.dup_span_stats(docs, "doc_id", "text", w=_W)


QUERIES = {
    "q_repeated_spans": q_repeated_spans,
    "q_winnow_pairs": q_winnow_pairs,
}

_FOLD = (
    "list_reduce(list_transform(range(1, 16), "
    "j -> CAST(strpos('0123456789abcdef', substr(md5({x}), j, 1)) - 1 "
    "AS BIGINT)), (a, b) -> a * 16 + b)"
)

ORACLES = {
    "q_winnow_pairs": rf"""
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
          FROM documents
        ), g AS (
          SELECT doc_id,
                 list_transform(range(1, greatest(len(t) - 5 + 1, 0) + 1),
                   i -> {_FOLD.format(x="array_to_string(t[i : i + 4], ' ')")}
                 ) AS h
          FROM toks
        ), f AS (
          SELECT DISTINCT doc_id, u.fp
          FROM g, UNNEST(
            list_distinct(list_transform(
              range(1, greatest(len(h) - 4 + 1, 0) + 1),
              j -> list_min(h[j : j + 3])))) AS u(fp)
        ), sized AS (
          SELECT fp FROM f GROUP BY fp
          HAVING COUNT(*) BETWEEN 2 AND 50
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM f a JOIN sized s ON a.fp = s.fp
                 JOIN f b ON b.fp = a.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2
    """,
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
