"""Round-4 corpus-statistics close-out: Zipf law fit per source.

Reference scope note: the reference pipeline
(``prefect/spark/fifa_spark.py``) has no text surface; this module
belongs to the LLM-training-data extension the build brief makes
first-class. A Zipf fit is the standard sanity probe on a text
corpus: natural language keeps a log-rank/log-frequency slope near
−1, while templated or machine-generated text (boilerplate, spam,
log dumps) departs sharply — so per-source slope + r² is a cheap
source-level quality gate before heavier curation runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fifa_data_pipeline_spark.operators.text import zipf_fit
from fifa_data_pipeline_spark.sources.io import read_table


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Zipf-law fit over the documents table — see
    :func:`fifa_data_pipeline_spark.operators.text.zipf_fit`."""
    docs = read_table(spark, sf_dir, "documents")
    return zipf_fit(docs, "source", "text")


QUERIES = {
    "q_zipf_fit": q_zipf_fit,
}

ORACLES = {
    "q_zipf_fit": r"""
        WITH toks AS (
          SELECT source, u.token
          FROM documents,
               UNNEST(string_split_regex(trim(text), '\s+')) AS u(token)
        ), counts AS (
          SELECT source, token, COUNT(*) AS freq
          FROM toks GROUP BY source, token
        ), ranked AS (
          SELECT source, freq,
                 ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY freq DESC, token
                 ) AS rank
          FROM counts
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(freq) AS BIGINT) AS n_tokens,
               ROUND(regr_slope(ln(freq), ln(rank)), 4) AS zipf_slope,
               ROUND(regr_intercept(ln(freq), ln(rank)), 4)
                 AS zipf_intercept,
               ROUND(regr_r2(ln(freq), ln(rank)), 6) AS r2
        FROM ranked GROUP BY source
    """,
}
