"""Round-5 batch 7: bigram LM scoring, incremental aggregate
maintenance with retractions, quality-signal fusion.

- ``q_bigram_lm`` — add-k smoothed bigram language-model logprob per
  document (one tier above q_lm_score's unigram model): the
  perplexity-filter workhorse of corpus curation.
- ``q_ivm_delta`` — incremental view maintenance: a per-flag
  (count, sum, avg) aggregate updated with an INSERT batch and a
  DELETE (retraction) batch purely algebraically; the oracle
  recomputes from scratch — equality is the IVM correctness
  property. Extends q_agg_merge (merge-only) with deletions.
- ``q_quality_fusion`` — fused document quality score from three
  signals (stopword ratio, lexical diversity, length prior) with a
  keep threshold — the FineWeb-style composite filter as one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fifa_data_pipeline_spark.operators.text import tokens
from fifa_data_pipeline_spark.operators.util import exploded, pin
from fifa_data_pipeline_spark.sources.io import read_table

#: Bigram LM smoothing constant.
LM_K = 0.5

#: Quality-fusion stopword list (shared with the oracle literally).
STOPWORDS = ("a", "the", "and", "or", "of", "to", "in", "is")

#: Quality-fusion keep threshold.
Q_THRESHOLD = 0.5


def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average bigram logprob under an add-k smoothed
    bigram LM trained on the corpus itself:

    lp(doc) = mean over bigrams of ln((c(w1,w2)+k) / (c(w1·)+k·V²_ctx))

    where c(w1·) is w1's count as a bigram CONTEXT and V_ctx the
    context vocabulary. Lower = more surprising under corpus
    statistics — the perplexity-filter signal, one model tier above
    q_lm_score's unigram.

    Scale shape: the model is |bigram types| rows (≤ vocab², tiny
    versus the corpus) built with one explode+agg; scoring joins each
    document bigram against the BROADCAST model (measured faster
    than the AQE shuffle join at sf1: the model is vocabulary-sized),
    so the corpus crosses one shuffle (the per-doc mean). Bigrams are
    built with NATIVE ``arrays_zip(t, slice(t, 2, …))`` — no lambda:
    the r5 ``zip_with(..., (a, b) -> struct(...))`` form ran its
    struct build interpreted per element (the r6 PMI A/B measured the
    native zip at 2.4× less for the identical pair stream). The
    narrow (doc, w1, w2) frame is lazily checkpointed: it feeds BOTH
    the model aggregate and the scoring join, and without the pin the
    tokenize+explode pipeline runs twice (measured 5.5 s → 4.0 s at
    sf1; same idiom as winnow_pairs). On a cluster swap
    localCheckpoint for a reliable checkpoint.
    """
    docs = read_table(spark, sf_dir, "documents")
    toked = docs.select("doc_id", tokens("text").alias("t"))
    bigram_arr = F.expr(
        "arrays_zip(t, slice(t, 2, greatest(size(t) - 1, 0)))"
    )
    bg = (
        exploded(toked, bigram_arr, "bg", keep=["doc_id"])
        .select(
            "doc_id",
            F.col("bg.t").alias("w1"),
            F.col("bg.1").alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
        .transform(pin("ext21"))
    )
    model = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = model.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = ctx.agg(F.count(F.lit(1)).alias("v"))
    scored = (
        bg.join(F.broadcast(model), ["w1", "w2"], "left")
        .join(F.broadcast(ctx), "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + LM_K)
                / (F.coalesce(F.col("c1"), F.lit(0)) + LM_K * F.col("v") * F.col("v"))
            ).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
    )


def q_ivm_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance with retractions: the standing
    per-returnflag (count, sum, avg) aggregate over pre-1999
    shipments is updated with an insert batch (1999 shipments) and a
    delete batch (1997 'R' returns, retracted) WITHOUT touching the
    base rows again — counts and sums are abelian-group aggregates,
    so state' = state + ins − del cell-wise. The oracle recomputes
    (base − deletes) ∪ inserts from scratch; equality is the IVM
    correctness property that foreachBatch upsert sinks and
    materialized views rely on. (min/max are NOT maintainable under
    deletion — they need a recompute or a monoid sketch — which is
    why this view carries only the additive family.)

    Scale: each maintenance cycle costs O(|delta|), not O(|base|);
    all three aggregates here share one scan+shuffle shape at the
    flag grain.
    """
    li = read_table(spark, sf_dir, "lineitem")
    base = li.filter(F.col("l_shipdate") < "1999-01-01")
    ins = li.filter(
        (F.col("l_shipdate") >= "1999-01-01")
        & (F.col("l_shipdate") < "2000-01-01")
    )
    dels = base.filter(
        (F.col("l_returnflag") == "R")
        & (F.year("l_shipdate") == 1997)
    )

    def state(df: DataFrame, sign: int) -> DataFrame:
        return df.groupBy("l_returnflag").agg(
            (F.count(F.lit(1)) * sign).alias("dn"),
            (F.sum("l_extendedprice") * sign).alias("ds"),
        )

    merged = (
        state(base, 1)
        .unionAll(state(ins, 1))
        .unionAll(state(dels, -1))
        .groupBy("l_returnflag")
        .agg(F.sum("dn").alias("n"), F.sum("ds").alias("s"))
    )
    return merged.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.round("s", 2).alias("sum_price"),
        F.round(F.col("s") / F.col("n"), 6).alias("avg_price"),
    )


def q_quality_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality filter in ONE scan: per document compute
    stopword ratio, lexical diversity (distinct/total tokens) and a
    saturating length prior, fuse with fixed weights, and report the
    per-source keep rate at the ``Q_THRESHOLD`` cut. The weights are
    a stand-in for a trained quality classifier's coefficients — the
    plumbing (signal extraction fused into one projection, no UDF,
    threshold audit per source) is the production shape."""
    docs = read_table(spark, sf_dir, "documents")
    from fifa_data_pipeline_spark.operators.util import let1

    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])

    # let1 binding (r12, guide §1.2 per-task work): the three signals
    # reference the token array five times in one projection, and
    # interpreted HOFs get no CSE — the r11 plan re-ran the split 5×
    # per row. Same expressions token-for-token, split bound once.
    def _score(t):
        n_tok = F.size(t)
        n_stop = F.size(
            F.filter(t, lambda x: F.array_contains(stop_arr, x))
        )
        n_dist = F.size(F.array_distinct(t))
        return (
            0.4 * (n_stop / n_tok)
            + 0.4 * (n_dist / n_tok)
            + 0.2 * F.least(n_tok, F.lit(500)) / 500
        )

    score = let1(tokens("text"), _score)
    scored = docs.select(
        "source", F.round(score, 9).alias("q")
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("q") >= Q_THRESHOLD).cast("int"))
        .cast("long")
        .alias("n_kept"),
        F.round(
            F.sum((F.col("q") >= Q_THRESHOLD).cast("int"))
            / F.count(F.lit(1)),
            4,
        ).alias("keep_rate"),
        F.round(F.avg("q"), 6).alias("avg_score"),
    )


QUERIES = {
    "q_bigram_lm": q_bigram_lm,
    "q_ivm_delta": q_ivm_delta,
    "q_quality_fusion": q_quality_fusion,
}

_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)

ORACLES = {
    "q_bigram_lm": f"""
        WITH toked AS (
          SELECT doc_id,
                 string_split_regex(trim(text), '\\s+') AS t
          FROM documents
        ), bg AS (
          SELECT doc_id, u.s[1] AS w1, u.s[2] AS w2
          FROM toked, unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) u(s)
        ), model AS (
          SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2
        ), ctx AS (
          SELECT w1, SUM(c12) AS c1 FROM model GROUP BY 1
        ), vocab AS (SELECT COUNT(*) AS v FROM ctx)
        SELECT b.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               ROUND(AVG(LN((COALESCE(m.c12, 0) + {LM_K})
                 / (COALESCE(c.c1, 0) + {LM_K} * vocab.v * vocab.v))), 6)
                 AS avg_logprob
        FROM bg b
        LEFT JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
        LEFT JOIN ctx c ON b.w1 = c.w1
        CROSS JOIN vocab
        GROUP BY b.doc_id
    """,
    "q_ivm_delta": """
        WITH live AS (
          SELECT * FROM lineitem
          WHERE l_shipdate < TIMESTAMP '2000-01-01'
            AND NOT (l_returnflag = 'R'
                     AND year(l_shipdate) = 1997
                     AND l_shipdate < TIMESTAMP '1999-01-01')
        )
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(l_extendedprice), 2) AS sum_price,
               ROUND(SUM(l_extendedprice) / COUNT(*), 6) AS avg_price
        FROM live GROUP BY l_returnflag
    """,
    "q_quality_fusion": f"""
        WITH sig AS (
          SELECT source,
                 ROUND(
                   0.4 * (len(list_filter(t, x -> x IN ({_STOP_SQL})))
                          / CAST(len(t) AS DOUBLE))
                   + 0.4 * (len(list_distinct(t)) / CAST(len(t) AS DOUBLE))
                   + 0.2 * LEAST(len(t), 500) / 500.0, 9) AS q
          FROM (
            SELECT source,
                   string_split_regex(trim(text), '\\s+') AS t
            FROM documents
          )
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN q >= {Q_THRESHOLD} THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_kept,
               ROUND(CAST(SUM(CASE WHEN q >= {Q_THRESHOLD} THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 4) AS keep_rate,
               ROUND(AVG(q), 6) AS avg_score
        FROM sig GROUP BY source
    """,
}
