"""Feature-engineering & signal queries (round 3b): quantile
clipping, domain mixture sampling, embedding centroids/quantization,
linear gap interpolation, bounded-lookback EWMA, unigram-LM quality
scoring, and passage-level dedup — the feature-preparation layer
between a cleaned corpus and model inputs (north-star surface; the
reference has none of these, SURVEY.md §2.5/§2.6).

Every query has an exact DuckDB oracle. FP-sensitive outputs are
rounded to 6 digits with accumulation order matched between engines;
hash-based constructions reuse the engine-portable md5 fold
established in plans/extended8.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fifa_data_pipeline_spark.operators import events as E
from fifa_data_pipeline_spark.operators import relational as R
from fifa_data_pipeline_spark.operators import text as X
from fifa_data_pipeline_spark.operators import vector as V
from fifa_data_pipeline_spark.sources.io import read_table

_TOKS = "string_split_regex(trim(text), '\\s+')"

#: DuckDB twin of Spark's CAST(conv(substring(md5(x),1,15),16,10) AS
#: BIGINT) % 1000000 (see relational.hash_split / mixture_sample).
_MD5_BUCKET_1M = (
    "list_reduce(list_transform(range(1, 16), "
    "j -> CAST(strpos('0123456789abcdef', "
    "substr(md5(CAST(doc_id AS VARCHAR)), j, 1)) - 1 AS BIGINT)), "
    "(a, b) -> a * 16 + b) % 1000000"
)


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type p01/p99 winsorization of the value column —
    every row kept, tails pulled to the exact interpolated fences."""
    ev = read_table(spark, sf_dir, "events")
    return R.winsorize(ev, "event_type", "value", lo=0.01, hi=0.99).select(
        "event_id", "event_type", F.round("value", 6).alias("value_r"),
        "clipped", "was_clipped",
    )


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-reweighted (τ=0.5) deterministic domain mixture
    over documents targeting half the corpus; per-source intake
    report (rows in, threshold, rows sampled)."""
    docs = read_table(spark, sf_dir, "documents")
    picked = R.mixture_sample(
        docs, "source", "doc_id", temperature=0.5, target_frac=0.5
    )
    return picked.groupBy("source", "domain_rows", "threshold").agg(
        F.count(F.lit(1)).alias("n_sampled")
    )


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid, one row per (label, dim)."""
    emb = read_table(spark, sf_dir, "embeddings")
    return V.label_centroids(emb, "label", "embedding")


def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of every embedding with
    round-trip diagnostics (per-vector scale, quantized array,
    reconstruction RMSE). The quantized vector is emitted as a
    comma-joined string: the correctness driver's canonicalizer
    cannot sort array-typed cells (pandas ``sort_values`` raises
    ``unhashable type: 'list'`` — r7 `err`), so driver-windowed
    queries emit arrays in scalar form (registry HARD RULE)."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = V.quantize_int8(emb, "vec_id", "embedding")
    return q.select(
        "vec_id",
        "scale",
        F.array_join("q_vec", ",").alias("q_vec"),
        "rmse",
    )


def q_interp_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-type resample of avg(value) with empty hours
    linearly interpolated between observed neighbors."""
    ev = read_table(spark, sf_dir, "events")
    return E.interpolate_linear(ev, "ts", "event_type", "value", "1 hour")


def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-lookback (20-row) EWMA of value per event_type,
    α=0.3 — one smoothed point per event."""
    from fifa_data_pipeline_spark.sources.io import (
        footer_minmax_micros,
    )

    ev = read_table(spark, sf_dir, "events")
    # ts bounds from footer stats (r11): zero Spark jobs; the
    # operator falls back to its aggregate probe on None.
    return E.ewma(
        ev, "event_type", "ts", "event_id", "value",
        bounds=footer_minmax_micros(f"{sf_dir}/events.parquet", "ts"),
    ).select(
        "event_id", "event_type", F.round("value", 6).alias("value_r"), "ewma"
    )


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score per document: mean negative log
    likelihood of its tokens under the corpus unigram model
    (perplexity-filter stand-in)."""
    docs = read_table(spark, sf_dir, "documents")
    return X.unigram_logprob(docs, "doc_id", "text")


def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level exact dedup: 64-token/16-overlap chunks are
    fingerprinted corpus-wide; a chunk survives iff it is the first
    occurrence of its fingerprint (min (doc_id, chunk_idx) wins).
    Per-document report of chunks kept vs total — the C4-style
    repeated-passage removal signal at chunk granularity."""
    docs = read_table(spark, sf_dir, "documents")
    chunks = X.chunk_documents(docs, "doc_id", "text", 64, 16)
    from pyspark.sql import Window

    w = Window.partitionBy("__fp")
    flagged = (
        chunks.withColumn("__fp", F.md5("chunk_text"))
        .withColumn(
            "__first",
            F.min(F.struct("doc_id", "chunk_idx")).over(w),
        )
        .withColumn(
            "kept",
            (F.col("__first.doc_id") == F.col("doc_id"))
            & (F.col("__first.chunk_idx") == F.col("chunk_idx")),
        )
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
    )


def q_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 3-gram Jaccard ≥ 0.5 similarity join via prefix
    filtering (AllPairs) — no LSH recall loss, no n² cross product.
    The oracle is the brute-force all-pairs SQL over the same id
    range: equality proves the prefix filter is lossless."""
    from fifa_data_pipeline_spark.operators import dedup as D

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return D.jaccard_prefix_join(docs, "doc_id", "text", k=3, threshold=0.5)


def q_label_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding moments (count, centroid norm, covariance
    trace) via the Arrow-native grouped-map path (``applyInArrow`` +
    numpy two-pass moments)."""
    emb = read_table(spark, sf_dir, "embeddings")
    return V.label_moments_arrow(emb, "label", "embedding")


def q_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value deviates > 3σ from their (event_type,
    hour-of-day) baseline — seasonality-aware anomaly detection."""
    ev = read_table(spark, sf_dir, "events")
    return E.seasonal_anomalies(ev, "ts", "event_type", "value", 3.0)


def q_dup_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-chain reachability via a RECURSIVE CTE (Spark ≥ 4.0
    ``WITH RECURSIVE``): over the ordered exact near-dup pair DAG
    (id_a < id_b, the q_ngram_jaccard pair set), every (n, m)
    reachable by a chain of pairwise near-dups with the minimum hop
    count — the "how long are my duplicate chains" diagnostic that
    motivates transitive closure over greedy pair-dropping.

    The recursion uses UNION ALL (Spark does not yet allow UNION
    inside recursion) and terminates because ids strictly increase
    along each chain — the DAG framing every engine's recursion
    supports. Final GROUP BY collapses duplicate paths to min hops.
    Scale: each recursion level is one join against the (small,
    verified) pair set; depth is bounded by the longest chain."""
    from fifa_data_pipeline_spark.operators import dedup as D

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = D.jaccard_prefix_join(
        docs, "doc_id", "text", k=3, threshold=0.5
    ).select("id_a", "id_b")
    pairs.createOrReplaceTempView("__dup_pairs")
    return spark.sql(
        """
        WITH RECURSIVE reach(n, m, hops) AS (
          SELECT id_a, id_b, 1 FROM __dup_pairs
          UNION ALL
          SELECT r.n, p.id_b, r.hops + 1
          FROM reach r JOIN __dup_pairs p ON p.id_a = r.m
        )
        SELECT n, m, MIN(hops) AS min_hops FROM reach GROUP BY n, m
        """
    )


def q_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 10 BPE merges learned from the document corpus
    (rows-only: iterative argmax training is not SQL-expressible;
    pinned by a pure-Python reference-implementation equality test in
    tests/test_extended9.py). The tokenizer applying these merges is
    hash-pinned end-to-end by ``q_bpe_tokens`` (driver-windowed r6),
    whose oracle replays the same merge table in SQL."""
    docs = read_table(spark, sf_dir, "documents")
    return X.bpe_train(docs, "text", num_merges=10)


def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics via the VARIANT type (Spark ≥4.0):
    ``parse_json`` once into a variant column, then typed
    ``variant_get`` extraction feeding an aggregate — the
    shred-at-read path that replaces per-access JSON string parsing
    (one parse per row instead of one per extracted field, and open
    schema evolution: new props keys need no DDL)."""
    ev = read_table(spark, sf_dir, "events")
    v = ev.withColumn("__v", F.parse_json("props"))
    return (
        v.withColumn("k", F.expr("variant_get(__v, '$.k', 'int')"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 heaviest user_id key groups in events with row share
    and times-mean-group-size — the pre-shuffle skew diagnostic."""
    ev = read_table(spark, sf_dir, "events")
    return R.skew_report(ev, ["user_id"], top_n=10)


def q_seq_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 'view eventually followed by purchase' sequence
    detection (MATCH_RECOGNIZE stand-in): ordered event-type string +
    non-greedy regex, first matching subsequence returned."""
    ev = read_table(spark, sf_dir, "events")
    return E.sequence_pattern(ev, "view>(?:[^>]+>)*?purchase")


def q_map_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: per event_type build an hour-of-day → count
    MAP (map_from_entries over a sorted collect_list), then explode
    it back to rows. The map is the natural shape for per-entity
    feature bags; exploding back keeps the oracle comparison on plain
    rows. One aggregate + per-row map ops, no extra shuffle."""
    ev = read_table(spark, sf_dir, "events")
    per_hour = (
        ev.groupBy("event_type", F.hour("ts").alias("hod"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    as_map = per_hour.groupBy("event_type").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("hod", "n")))
        ).alias("by_hour")
    )
    return as_map.select(
        "event_type",
        F.map_keys("by_hour").alias("__ks"),
        F.explode("by_hour").alias("hod", "n"),
    ).select(
        "event_type",
        F.size("__ks").cast("int").alias("n_hours"),
        "hod",
        "n",
    )


def q_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe ingestion semantics: under Spark 4's ANSI mode a bad
    CAST fails the JOB, so dirty-input pipelines use try_cast (NULL
    on failure). Parses the first whitespace token of each document
    as an int and reports per-source parse rates — the
    dirty-CSV-column triage shape."""
    docs = read_table(spark, sf_dir, "documents")
    tok = F.element_at(F.split(F.trim("text"), r"\s+"), 1)
    parsed = docs.select(
        "source", tok.try_cast("int").alias("as_int"), tok.alias("tok")
    )
    return parsed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("as_int").alias("n_parsed"),
        F.sum(F.when(F.col("as_int").isNull() & F.col("tok").isNotNull(), 1)
              .otherwise(0)).cast("bigint").alias("n_failed"),
    )


def q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type 10-90% trimmed mean via a pandas GROUPED-AGG
    UDF (the UDAF tier) — oracle-exact because pandas quantile and
    DuckDB quantile_cont share linear interpolation."""
    from fifa_data_pipeline_spark.operators import pandas_ops as P

    ev = read_table(spark, sf_dir, "events")
    return P.trimmed_mean(ev, "event_type", "value")


QUERIES = {
    "q_jaccard_prefix": q_jaccard_prefix,
    "q_dup_chains": q_dup_chains,
    "q_bpe_vocab": q_bpe_vocab,
    "q_variant_extract": q_variant_extract,
    "q_trimmed_mean": q_trimmed_mean,
    "q_skew_report": q_skew_report,
    "q_seq_pattern": q_seq_pattern,
    "q_map_roundtrip": q_map_roundtrip,
    "q_try_cast": q_try_cast,
    "q_label_moments": q_label_moments,
    "q_seasonal_anomaly": q_seasonal_anomaly,
    "q_winsorize": q_winsorize,
    "q_mixture_sample": q_mixture_sample,
    "q_label_centroids": q_label_centroids,
    "q_embed_quantize": q_embed_quantize,
    "q_interp_linear": q_interp_linear,
    "q_ewma": q_ewma,
    "q_lm_score": q_lm_score,
    "q_chunk_dedup": q_chunk_dedup,
}

_CHUNK, _STRIDE = 64, 48

ORACLES = {
    "q_jaccard_prefix": f"""
        WITH t AS (
          SELECT doc_id, {_TOKS} AS toks FROM documents WHERE doc_id < 300
        ), g AS (
          SELECT doc_id, list_distinct(
            [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             for i in range(1, len(toks) - 1)]) AS s
          FROM t
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ROUND(len(list_intersect(a.s, b.s)) /
                     len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
        FROM g a, g b
        WHERE a.doc_id < b.doc_id
          AND ROUND(len(list_intersect(a.s, b.s)) /
                    len(list_distinct(list_concat(a.s, b.s))), 6) >= 0.5
    """,
    "q_map_roundtrip": """
        WITH h AS (
          SELECT event_type,
                 CAST(extract(hour FROM ts) AS INTEGER) AS hod,
                 COUNT(*) AS n
          FROM events GROUP BY 1, 2
        ), k AS (
          SELECT event_type, CAST(COUNT(*) AS INTEGER) AS n_hours
          FROM h GROUP BY event_type
        )
        SELECT h.event_type, k.n_hours, h.hod, h.n
        FROM h JOIN k USING (event_type)
    """,
    "q_try_cast": """
        WITH t AS (
          SELECT source,
                 string_split_regex(trim(text), '\\s+')[1] AS tok
          FROM documents
        )
        SELECT source,
               COUNT(*) AS n_docs,
               COUNT(TRY_CAST(tok AS INTEGER)) AS n_parsed,
               CAST(SUM(CASE WHEN TRY_CAST(tok AS INTEGER) IS NULL
                              AND tok IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_failed
        FROM t GROUP BY source
    """,
    "q_seq_pattern": """
        WITH s AS (
          SELECT user_id,
                 COUNT(*) AS n_events,
                 string_agg(event_type, '>' ORDER BY ts, event_id) AS seq
          FROM events GROUP BY user_id
        )
        SELECT user_id, n_events,
               COALESCE(regexp_extract(seq,
                 'view>(?:[^>]+>)*?purchase'), '') AS first_match,
               COALESCE(regexp_extract(seq,
                 'view>(?:[^>]+>)*?purchase'), '') <> '' AS matched
        FROM s
    """,
    "q_skew_report": """
        WITH c AS (
          SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY user_id
        ), t AS (
          SELECT CAST(SUM(n_rows) AS DOUBLE) AS total,
                 COUNT(*) AS groups
          FROM c
        )
        SELECT user_id, n_rows,
               ROUND(n_rows / t.total, 6) AS row_share,
               ROUND(n_rows / (t.total / t.groups), 6) AS x_mean_group
        FROM c, t
        ORDER BY n_rows DESC, user_id
        LIMIT 10
    """,
    "q_trimmed_mean": """
        WITH f AS (
          SELECT event_type,
                 quantile_cont(value, 0.1) AS lo,
                 quantile_cont(value, 0.9) AS hi,
                 COUNT(*) AS n
          FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               MAX(f.n) AS n,
               ROUND(AVG(e.value), 6) AS trimmed_mean
        FROM events e JOIN f USING (event_type)
        WHERE e.value >= f.lo AND e.value <= f.hi
        GROUP BY e.event_type
    """,
    "q_variant_extract": """
        SELECT event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))
                    AS BIGINT) AS sum_k,
               CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER))
                    AS INTEGER) AS max_k
        FROM events GROUP BY event_type
    """,
    "q_dup_chains": f"""
        WITH RECURSIVE t AS (
          SELECT doc_id, {_TOKS} AS toks FROM documents WHERE doc_id < 200
        ), g AS (
          SELECT doc_id, list_distinct(
            [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             for i in range(1, len(toks) - 1)]) AS s
          FROM t
        ), pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM g a, g b
          WHERE a.doc_id < b.doc_id
            AND ROUND(len(list_intersect(a.s, b.s)) /
                      len(list_distinct(list_concat(a.s, b.s))), 6) >= 0.5
        ), reach(n, m, hops) AS (
          SELECT id_a, id_b, 1 FROM pairs
          UNION ALL
          SELECT r.n, p.id_b, r.hops + 1
          FROM reach r JOIN pairs p ON p.id_a = r.m
        )
        SELECT n, m, CAST(MIN(hops) AS BIGINT) AS min_hops
        FROM reach GROUP BY n, m
    """,
    "q_label_moments": """
        WITH d AS (
          SELECT label, i AS dim,
                 AVG(CAST(embedding[i] AS DOUBLE)) AS mu,
                 var_pop(CAST(embedding[i] AS DOUBLE)) AS v,
                 COUNT(*) AS n
          FROM embeddings,
               LATERAL (SELECT unnest(generate_series(1, len(embedding)))
                        AS i) t
          GROUP BY label, i
        )
        SELECT label,
               CAST(MAX(n) AS BIGINT) AS n_vecs,
               ROUND(sqrt(SUM(mu * mu)), 6) AS mean_norm,
               ROUND(SUM(v), 6) AS cov_trace
        FROM d GROUP BY label
    """,
    "q_seasonal_anomaly": """
        WITH b AS (
          SELECT event_type, extract(hour FROM ts) AS hod,
                 AVG(value) AS mu, stddev_pop(value) AS sd
          FROM events GROUP BY 1, 2
        )
        SELECT e.event_id, e.event_type,
               CAST(extract(hour FROM e.ts) AS INTEGER) AS hod,
               ROUND(e.value, 6) AS value_r,
               ROUND(b.mu, 6) AS baseline_mu,
               ROUND((e.value - b.mu) / b.sd, 6) AS z
        FROM events e
        JOIN b ON b.event_type = e.event_type
              AND b.hod = extract(hour FROM e.ts)
        WHERE b.sd > 0
          AND ABS(ROUND((e.value - b.mu) / b.sd, 6)) > 3.0
    """,
    "q_winsorize": """
        WITH f AS (
          SELECT event_type,
                 quantile_cont(value, 0.01) AS lo,
                 quantile_cont(value, 0.99) AS hi
          FROM events GROUP BY event_type
        )
        SELECT e.event_id, e.event_type,
               ROUND(e.value, 6) AS value_r,
               ROUND(LEAST(GREATEST(e.value, f.lo), f.hi), 6) AS clipped,
               (e.value < f.lo OR e.value > f.hi) AS was_clipped
        FROM events e JOIN f USING (event_type)
    """,
    "q_mixture_sample": f"""
        WITH c AS (
          SELECT source, COUNT(*) AS n FROM documents GROUP BY source
        ), t AS (
          SELECT CAST(SUM(n) AS DOUBLE) AS grand,
                 SUM(pow(n, 0.5)) AS wsum
          FROM c
        ), th AS (
          SELECT source, n,
                 CAST(FLOOR(ROUND(LEAST(1.0,
                      0.5 * grand * pow(n, 0.5) / wsum / n) * 1000000, 3))
                      AS BIGINT) AS threshold
          FROM c, t
        )
        SELECT d.source,
               th.n AS domain_rows,
               th.threshold,
               COUNT(*) AS n_sampled
        FROM documents d JOIN th ON d.source = th.source
        WHERE {_MD5_BUCKET_1M} < th.threshold
        GROUP BY 1, 2, 3
    """,
    "q_label_centroids": """
        SELECT label,
               CAST(i - 1 AS INTEGER) AS dim,
               ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 6) AS centroid,
               COUNT(*) AS n_vecs
        FROM embeddings,
             LATERAL (SELECT unnest(generate_series(1, len(embedding)))
                      AS i) t
        GROUP BY 1, 2
    """,
    "q_embed_quantize": """
        WITH v AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
          FROM embeddings
        ), s AS (
          SELECT vec_id, emb,
                 list_reduce(list_transform(emb, x -> abs(x)),
                             (a, b) -> greatest(a, b)) / 127.0 AS scale
          FROM v
        ), q AS (
          SELECT vec_id, emb, scale,
                 list_transform(emb, x -> CAST(ROUND(x / scale) AS INTEGER))
                   AS q_vec
          FROM s
        )
        SELECT vec_id,
               ROUND(scale, 9) AS scale,
               array_to_string(q_vec, ',') AS q_vec,
               ROUND(sqrt(list_reduce(
                 list_transform(range(1, len(emb) + 1),
                   i -> (emb[i] - q_vec[i] * scale)
                      * (emb[i] - q_vec[i] * scale)),
                 (a, b) -> a + b) / len(emb)), 9) AS rmse
        FROM q
    """,
    "q_interp_linear": """
        WITH b AS (
          SELECT date_trunc('hour', MIN(ts)) AS mn,
                 date_trunc('hour', MAX(ts)) AS mx
          FROM events
        ), spine AS (
          SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM b
        ), k AS (
          SELECT DISTINCT event_type FROM events
        ), c AS (
          SELECT date_trunc('hour', ts) AS h, event_type,
                 list_reduce(list_sort(list(value)), (a, b) -> a + b)
                   / COUNT(value) AS v
          FROM events GROUP BY 1, 2
        ), grid AS (
          SELECT extract(epoch FROM s.h) AS ep, k.event_type, c.v
          FROM spine s CROSS JOIN k
          LEFT JOIN c ON c.h = s.h AND c.event_type = k.event_type
        ), filled AS (
          SELECT ep, event_type, v,
                 last_value(v IGNORE NULLS) OVER wb AS pv,
                 last_value(CASE WHEN v IS NOT NULL THEN ep END IGNORE NULLS)
                   OVER wb AS pb,
                 first_value(v IGNORE NULLS) OVER wf AS nv,
                 first_value(CASE WHEN v IS NOT NULL THEN ep END IGNORE NULLS)
                   OVER wf AS nb
          FROM grid
          WINDOW wb AS (PARTITION BY event_type ORDER BY ep
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 wf AS (PARTITION BY event_type ORDER BY ep
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT CAST(FLOOR(ep) AS BIGINT) AS period_s,
               event_type,
               v IS NOT NULL AS observed,
               CASE
                 WHEN v IS NOT NULL THEN v
                 WHEN pv IS NULL THEN nv
                 WHEN nv IS NULL THEN pv
                 ELSE pv + (nv - pv) * (ep - pb) / (nb - pb)
               END AS value_filled
        FROM filled
    """,
    "q_ewma": """
        SELECT event_id, event_type,
               ROUND(value, 6) AS value_r,
               ROUND(list_reduce(l, (acc, x) -> 0.3 * x + 0.7 * acc), 6)
                 AS ewma
        FROM (
          SELECT event_id, event_type, value,
                 list(value) OVER (PARTITION BY event_type
                                   ORDER BY ts, event_id
                                   ROWS BETWEEN 19 PRECEDING
                                   AND CURRENT ROW) AS l
          FROM events
        )
    """,
    "q_lm_score": f"""
        WITH ex AS (
          SELECT doc_id, unnest({_TOKS}) AS token FROM documents
        ), lm AS (
          SELECT token, COUNT(*) AS tc FROM ex GROUP BY token
        ), t AS (
          SELECT CAST(SUM(tc) AS DOUBLE) AS total FROM lm
        )
        SELECT ex.doc_id,
               COUNT(*) AS n_tokens,
               ROUND(-AVG(ln(lm.tc / t.total)), 6) AS nll
        FROM ex JOIN lm USING (token), t
        GROUP BY ex.doc_id
    """,
    "q_chunk_dedup": f"""
        WITH t AS (
          SELECT doc_id, {_TOKS} AS toks FROM documents
        ), s AS (
          SELECT doc_id, toks,
                 unnest(range(0, greatest(len(toks) - 1, 0) + 1, {_STRIDE}))
                   AS start
          FROM t
        ), chunks AS (
          SELECT doc_id,
                 CAST(start // {_STRIDE} AS INTEGER) AS chunk_idx,
                 md5(array_to_string(toks[start + 1 : start + {_CHUNK}], ' '))
                   AS fp
          FROM s
        ), flagged AS (
          SELECT doc_id,
                 (doc_id, chunk_idx) = MIN((doc_id, chunk_idx))
                   OVER (PARTITION BY fp) AS kept
          FROM chunks
        )
        SELECT doc_id,
               COUNT(*) AS n_chunks,
               CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_kept
        FROM flagged GROUP BY doc_id
    """,
}
