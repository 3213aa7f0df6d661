"""Full-text retrieval operators: inverted index + BM25 ranking.

The training-data side of retrieval: build a distributed inverted
index (posting lists per token) and score documents against a query
with BM25 — both as pure DataFrame aggregations over the tokenizer
already used by the TF-IDF family (`operators/text.py`).

Scale notes: the index build is one explode + one groupBy(token) —
the classic shuffle-by-term construction; posting lists are bounded
per token by ``min_df``/document partitioning, and skewed stop-words
should be stop-listed upstream (`top_tokens`). BM25 scoring
broadcasts the tiny per-term IDF table and the scalar corpus stats;
the only wide shuffle is the per-document score sum.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fifa_data_pipeline_spark.operators.text import tokens, token_count_expr
from fifa_data_pipeline_spark.operators.util import exploded


def term_frequencies(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, token) → tf. One explode + one aggregate; the explode
    routes around ``InferFiltersFromGenerate`` (see ``util.exploded``)."""
    return (
        exploded(docs, tokens(text_col), "token", keep=[id_col])
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Distributed inverted index: per token, document frequency,
    total term count, and the sorted posting list (``"doc:tf"``
    strings — engine-portable, deterministic order).

    ``sort_array(collect_list(...))`` gives a canonical posting
    order without a sort shuffle (sorting happens per aggregation
    group). ``min_df`` drops hapax terms, the usual index-size
    control.
    """
    tf = term_frequencies(docs, id_col, text_col)
    return (
        tf.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("total_tf"),
            F.sort_array(
                F.collect_list(
                    F.concat_ws(":", F.col(id_col).cast("string"), F.col("tf"))
                )
            ).alias("postings"),
        )
        .filter(F.col("df") >= min_df)
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
) -> DataFrame:
    """BM25 top-k retrieval for a fixed bag of query terms.

    idf(t) = ln((N − df + 0.5) / (df + 0.5) + 1)   (Lucene form)
    score(d) = Σ_t idf · tf·(k1+1) / (tf + k1·(1 − b + b·len/avglen))

    Corpus stats (N, avglen) are an all-to-one aggregate of two
    numbers; the per-term df table is at most |query| rows — both
    cross-joined/broadcast, so the scan side never shuffles until the
    final per-document sum. Ranking breaks ties by ``id_col`` for a
    deterministic top-k.
    """
    terms = [t.lower() for t in query_terms]
    lengths = docs.select(
        F.col(id_col), token_count_expr(text_col).cast("int").alias("dl")
    )
    stats = lengths.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = term_frequencies(docs, id_col, text_col).filter(
        F.col("token").isin(*terms)
    )
    df_t = tf.groupBy("token").agg(F.count(F.lit(1)).alias("dft"))
    scored = (
        tf.join(F.broadcast(df_t), "token")
        .join(lengths, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("dft") + 0.5)
                / (F.col("dft") + 0.5)
                + 1.0
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("term_score"), 6).alias("bm25"))
    )
    return (
        scored.orderBy(F.desc("bm25"), F.col(id_col))
        .limit(k)
    )
