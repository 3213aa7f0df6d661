"""Sixth extended-surface batch: the UDTF extension point (lateral
one-to-many table function) with its JVM-native twin, and iterative
PageRank over a graph derived from the purchase data.

q_udtf_sentences / q_sentences_native share one DuckDB oracle (the
identical RE2-safe split pattern runs on all three engines).
q_pagerank is rows-only — an iterative fixpoint isn't expressible as
one ANSI query — pinned instead by ``test_extended6.py``'s
power-iteration reference on a hand-built graph plus mass-conservation
invariants on the real one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fifa_data_pipeline_spark.operators.graph import pagerank
from fifa_data_pipeline_spark.operators.tablefuncs import (
    split_sentences,
    split_sentences_native,
)
from fifa_data_pipeline_spark.sources.io import read_table

#: Segment boundary for the synthetic corpus: its text carries no
#: sentence punctuation, so segment on the stopword 'the' (plus the
#: standard punctuation rule) — this makes the one-to-many expansion
#: real (~3 segments/doc) instead of a degenerate 1:1 pass-through.
_SEG = r"[.!?]+\s+|\sthe\s"


def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment rows via the Python UDTF (LATERAL table function)."""
    docs = read_table(spark, sf_dir, "documents")
    return split_sentences(spark, docs, pattern=_SEG)


def q_sentences_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same rows via the zero-shuffle native array pipeline."""
    docs = read_table(spark, sf_dir, "documents")
    return split_sentences_native(docs, pattern=_SEG)


def purchase_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed 3-layer graph from the purchase data: customer →
    part (bought) and part → supplier (supplied by). Node ids are
    prefixed strings so the layers share one key space."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust_part = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("c:"), "o_custkey").alias("src"),
            F.concat(F.lit("p:"), "l_partkey").alias("dst"),
        )
    )
    part_supp = li.select(
        F.concat(F.lit("p:"), "l_partkey").alias("src"),
        F.concat(F.lit("s:"), "l_suppkey").alias("dst"),
    )
    return cust_part.unionAll(part_supp)


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the purchase graph, 10 power iterations —
    suppliers accumulate rank through their parts' buyers. Rounded
    to 6 dp for cross-run stability of the rows-only hash."""
    ranks = pagerank(purchase_graph(spark, sf_dir), n_iter=10)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


QUERIES = {
    "q_udtf_sentences": q_udtf_sentences,
    "q_sentences_native": q_sentences_native,
    "q_pagerank": q_pagerank,
}

_SENT_ORACLE = f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(list_transform(
               string_split_regex(text, '{_SEG}'),
               x -> trim(x)), x -> x <> '') AS frags
      FROM documents
    )
    SELECT doc_id,
           CAST(i AS INTEGER) AS sent_idx,
           frags[i] AS sentence
    FROM t, unnest(range(1, len(frags) + 1)) AS u(i)
"""

ORACLES = {
    "q_udtf_sentences": _SENT_ORACLE,
    "q_sentences_native": _SENT_ORACLE,
}
