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
from pyspark.sql import functions as F

from fifa_data_pipeline_spark.operators.util import pin

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


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gopher-filter report (min_words=20 to fit the
    synthetic docs' length range): docs passing the full conjunction
    and per-rule failure counts — the audit table a curation run
    publishes alongside the filtered corpus."""
    from fifa_data_pipeline_spark.operators import text as X
    from pyspark.sql import functions as F

    docs = read_table(spark, sf_dir, "documents")
    r = X.gopher_rules(docs, min_words=20)
    cnt = lambda c: F.sum(F.when(~F.col(c), 1).otherwise(0)).alias(f"fail_{c[2:]}")  # noqa: E731
    return r.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("passes_gopher"), 1).otherwise(0)).alias("n_pass"),
        cnt("r_word_count"),
        cnt("r_mean_word_len"),
        cnt("r_symbol_ratio"),
        cnt("r_bullet_lines"),
        cnt("r_ellipsis_lines"),
        cnt("r_alpha_words"),
        cnt("r_required_words"),
    )


QUERIES["q_gopher_rules"] = q_gopher_rules

ORACLES["q_gopher_rules"] = r"""
    WITH t AS (
      SELECT source,
             string_split_regex(trim(text), '\s+') AS w,
             string_split(text, chr(10)) AS l
      FROM documents
    ), r AS (
      SELECT source,
             len(w) AS nw,
             (len(w) BETWEEN 20 AND 100000) AS r_word_count,
             (list_sum(list_transform(w, x -> len(x))) / len(w)
                BETWEEN 3 AND 10) AS r_mean_word_len,
             (len(list_filter(w, x -> contains(x, '#')
                OR contains(x, '...') OR contains(x, '…'))) / len(w)
                < 0.1) AS r_symbol_ratio,
             (len(list_filter(l, x -> starts_with(trim(x), '-')
                OR starts_with(trim(x), '*')
                OR starts_with(trim(x), '•'))) / len(l)
                < 0.9) AS r_bullet_lines,
             (len(list_filter(l, x -> ends_with(trim(x), '...')
                OR ends_with(trim(x), '…'))) / len(l)
                < 0.3) AS r_ellipsis_lines,
             (len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
                / len(w) > 0.8) AS r_alpha_words,
             (len(list_intersect(list_distinct(list_transform(w,
                x -> lower(x))),
                ['the','be','to','of','and','that','have','with']))
                >= 2) AS r_required_words
      FROM t
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN r_word_count AND r_mean_word_len
                          AND r_symbol_ratio AND r_bullet_lines
                          AND r_ellipsis_lines AND r_alpha_words
                          AND r_required_words
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(SUM(CASE WHEN NOT r_word_count THEN 1 ELSE 0 END) AS BIGINT) AS fail_word_count,
           CAST(SUM(CASE WHEN NOT r_mean_word_len THEN 1 ELSE 0 END) AS BIGINT) AS fail_mean_word_len,
           CAST(SUM(CASE WHEN NOT r_symbol_ratio THEN 1 ELSE 0 END) AS BIGINT) AS fail_symbol_ratio,
           CAST(SUM(CASE WHEN NOT r_bullet_lines THEN 1 ELSE 0 END) AS BIGINT) AS fail_bullet_lines,
           CAST(SUM(CASE WHEN NOT r_ellipsis_lines THEN 1 ELSE 0 END) AS BIGINT) AS fail_ellipsis_lines,
           CAST(SUM(CASE WHEN NOT r_alpha_words THEN 1 ELSE 0 END) AS BIGINT) AS fail_alpha_words,
           CAST(SUM(CASE WHEN NOT r_required_words THEN 1 ELSE 0 END) AS BIGINT) AS fail_required_words
    FROM r GROUP BY source
"""


def q_dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance scores with target = the 'en'-labeled docs:
    per-doc hashed-bigram log-likelihood ratio (micro-unit integer
    sums — order-free, engine-portable)."""
    from pyspark.sql import functions as F

    docs = read_table(spark, sf_dir, "documents").withColumn(
        "__is_target", F.col("lang") == "en"
    )
    from fifa_data_pipeline_spark.operators import text as X

    # integer columns only: score_micro/n_bigrams are exact BIGINTs in
    # both engines, while the convenience double `score` can land on
    # an exact .5 micro-average where Spark's BigDecimal HALF_UP and
    # DuckDB's float rounding disagree (observed at sf0.1, doc 4326)
    return X.dsir_scores(docs, "doc_id", "text", "__is_target").select(
        "doc_id", "n_bigrams", "score_micro"
    )


QUERIES["q_dsir_scores"] = q_dsir_scores

ORACLES["q_dsir_scores"] = rf"""
    WITH toks AS (
      SELECT doc_id, (lang = 'en') AS t_,
             string_split_regex(trim(text), '\s+') AS w
      FROM documents
    ), base AS (
      SELECT doc_id, t_,
             {_FOLD.format(x="u.g")} % 256 AS b
      FROM toks, UNNEST(
        CASE WHEN len(w) >= 2 THEN
          list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
        ELSE [] END) AS u(g)
    ), doc_counts AS (
      SELECT doc_id, b, COUNT(*) AS c FROM base GROUP BY 1, 2
    ), bucket AS (
      SELECT b, COUNT(*) AS raw,
             SUM(CASE WHEN t_ THEN 1 ELSE 0 END) AS tgt
      FROM base GROUP BY b
    ), totals AS (
      SELECT SUM(raw) AS nraw, SUM(tgt) AS ntgt FROM bucket
    ), wts AS (
      SELECT b,
             CAST(ROUND((ln((tgt + 0.5) / (ntgt + 0.5 * 256))
                       - ln((raw + 0.5) / (nraw + 0.5 * 256)))
                  * 1000000, 0) AS BIGINT) AS wt
      FROM bucket, totals
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_bigrams,
           CAST(SUM(c * wt) AS BIGINT) AS score_micro
    FROM doc_counts JOIN wts USING (b)
    GROUP BY doc_id
"""


def q_trim_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-dedup CLEANING at w=8: tokens covered by a
    cross-document repeated span are removed and the survivors
    re-joined — the action q_repeated_spans scores."""
    docs = read_table(spark, sf_dir, "documents")
    return D.trim_repeated_spans(docs, "doc_id", "text", w=_W)


QUERIES["q_trim_spans"] = q_trim_spans

ORACLES["q_trim_spans"] = rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id, i.i AS pos,
             array_to_string(t[i.i : i.i + {_W} - 1], ' ') AS gram
      FROM toks, UNNEST(range(1, greatest(len(t) - {_W} + 1, 0) + 1)) AS i(i)
    ), multi AS (
      SELECT gram FROM grams
      GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
    ), starts AS (
      SELECT doc_id, list(DISTINCT pos) AS st
      FROM grams JOIN multi USING (gram) GROUP BY doc_id
    ), masked AS (
      SELECT k.doc_id, k.t,
             list_filter(
               list_transform(range(1, len(k.t) + 1),
                 p -> CASE WHEN len(list_filter(
                        CASE WHEN s.st IS NULL THEN [] ELSE s.st END,
                        x -> x <= p AND p < x + {_W})) = 0
                      THEN k.t[p] END),
               v -> v IS NOT NULL) AS kept
      FROM toks k LEFT JOIN starts s USING (doc_id)
    )
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(len(t) - len(kept) AS BIGINT) AS n_removed,
           COALESCE(array_to_string(kept, ' '), '') AS cleaned_text
    FROM masked
"""


def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 95% subsampling-bootstrap CI for the mean
    lineitem extended price (2-dp fixed point, 40 replicates) —
    reproducible across engines because the resampling coin is
    content-addressed and every statistic is an integer micro-unit."""
    from fifa_data_pipeline_spark.operators import relational as R

    li = read_table(spark, sf_dir, "lineitem")
    return R.bootstrap_ci(
        li, ["l_orderkey", "l_linenumber"], "l_extendedprice",
        n_replicates=40, alpha=0.05, scale=100,
    )


QUERIES["q_bootstrap_ci"] = q_bootstrap_ci

ORACLES["q_bootstrap_ci"] = rf"""
    WITH hashed AS (
      SELECT CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS v,
             {_FOLD.format(
                 x="CAST(l_orderkey AS VARCHAR) || '-' || "
                   "CAST(l_linenumber AS VARCHAR)")} AS h
      FROM lineitem
    ), flt AS (
      SELECT i.b AS rep, v FROM hashed, UNNEST(range(0, 40)) AS i(b)
      WHERE ((h >> i.b) & 1) = 0
    ), reps AS (
      SELECT rep,
             CAST(ROUND(SUM(v) * 10000.0 / COUNT(*), 0) AS BIGINT)
               AS mean_micro
      FROM flt GROUP BY rep
    ), ranked AS (
      SELECT mean_micro,
             ROW_NUMBER() OVER (ORDER BY mean_micro, rep) AS r
      FROM reps
    ), bounds AS (
      -- survivor-aware order-statistic indices: empty replicates
      -- never reach `reps` (GROUP BY), so b = surviving count and
      -- the lo/hi ranks rescale exactly like the Spark side
      SELECT MAX(CASE WHEN r = GREATEST(1,
                   CAST(CEIL(0.025 * b) AS BIGINT))
                 THEN mean_micro END) AS ci_lo_micro,
             MAX(CASE WHEN r = LEAST(b,
                   CAST(CEIL(0.975 * b) AS BIGINT))
                 THEN mean_micro END) AS ci_hi_micro
      FROM (SELECT mean_micro, r, COUNT(*) OVER () AS b FROM ranked)
    ), whole AS (
      SELECT CAST(ROUND(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                        * 10000.0 / COUNT(*), 0) AS BIGINT) AS mean_micro,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem
    )
    SELECT f.mean_micro, b.ci_lo_micro, b.ci_hi_micro, f.n_rows,
           CAST(40 AS BIGINT) AS n_replicates
    FROM whole f, bounds b
"""


def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native Spark-4 ``WITH RECURSIVE``: bounded transitive closure
    (<= 3 hops) over the ordered duplicate-fingerprint edge DAG —
    previously this repo expressed iteration only via driver loops
    (connected_components) while recursive CTEs lived solely in the
    DuckDB oracles; Spark 4.1 runs the recursion natively, so the
    SQL-surface parity gap closes. Edges are id_a < id_b (a DAG), so
    the recursion terminates structurally; the hop guard bounds work
    per iteration — the same discipline a 100 TB closure needs
    (each recursive step is one distributed join).

    The edge list is MATERIALIZED (lazy localCheckpoint → temp view)
    before the recursion: a plain edges CTE is a plan alias, so every
    recursive step would re-derive the md5-fingerprint self-join
    (measured 8.1 s → 6.1 s at sf1 from pinning it once; reliable
    checkpoint on a cluster)."""
    from fifa_data_pipeline_spark.sources.io import register_views

    register_views(spark, sf_dir, ["documents"])
    fp = spark.table("documents").select(
        "doc_id",
        F.md5(
            F.concat_ws(
                " ", F.slice(F.split(F.trim("text"), r"\s+", 9), 1, 8)
            )
        ).alias("fp"),
    )
    edges = (
        fp.alias("a")
        .join(fp.alias("b"), "fp")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("src"),
            F.col("b.doc_id").alias("dst"),
        )
        .transform(pin("ext25"))
    )
    edges.createOrReplaceTempView("__rcte_edges")
    return spark.sql(r"""
      WITH RECURSIVE reach(src, dst, hops) AS (
        SELECT src, dst, 1 FROM __rcte_edges
        UNION ALL
        SELECT r.src, e.dst, r.hops + 1
        FROM reach r JOIN __rcte_edges e ON r.dst = e.src
        WHERE r.hops < 3
      )
      SELECT src, dst, CAST(MIN(hops) AS BIGINT) AS min_hops
      FROM reach GROUP BY src, dst
    """)


QUERIES["q_recursive_cte"] = q_recursive_cte

ORACLES["q_recursive_cte"] = r"""
    WITH RECURSIVE edges AS (
      SELECT f1.doc_id AS src, f2.doc_id AS dst
      FROM (SELECT doc_id,
                   md5(array_to_string(
                     string_split_regex(trim(text), '\s+')[1:8], ' ')) AS fp
            FROM documents) f1
      JOIN (SELECT doc_id,
                   md5(array_to_string(
                     string_split_regex(trim(text), '\s+')[1:8], ' ')) AS fp
            FROM documents) f2
        ON f1.fp = f2.fp AND f1.doc_id < f2.doc_id
    ), reach(src, dst, hops) AS (
      SELECT src, dst, 1 FROM edges
      UNION ALL
      SELECT r.src, e.dst, r.hops + 1
      FROM reach r JOIN edges e ON r.dst = e.src
      WHERE r.hops < 3
    )
    SELECT src, dst, CAST(MIN(hops) AS BIGINT) AS min_hops
    FROM reach GROUP BY src, dst
"""
