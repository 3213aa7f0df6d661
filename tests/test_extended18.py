"""Semantic tests for extended18 (AUC, Theil–Sen, lateness audit,
RRF fusion) beyond the oracle hash parity."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fifa_data_pipeline_spark.plans import extended18 as X18


def _auc_reference(scores: np.ndarray, labels: np.ndarray) -> float:
    """Tied Mann–Whitney AUC via average ranks (independent method
    from the engine's distribution-count identity)."""
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty(len(scores), dtype=np.float64)
    s = scores[order]
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0  # average 1-based rank
        i = j
    p = labels.sum()
    n = len(labels) - p
    return float((ranks[labels].sum() - p * (p + 1) / 2) / (p * n))


def test_auc_matches_rank_reference(spark, sf_dir):
    got = X18.q_auc(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    for _, row in got.iterrows():
        sub = docs[docs["source"] == row["source"]]
        ref = _auc_reference(
            sub["n_chars"].to_numpy().astype(np.float64),
            (sub["lang"] == "en").to_numpy(),
        )
        assert abs(row["auc"] - ref) < 2e-6
        assert row["n_pos"] + row["n_neg"] == len(sub)
    assert (got["auc"] >= 0).all() and (got["auc"] <= 1).all()


def test_theil_sen_matches_numpy(spark, sf_dir):
    got = X18.q_theil_sen(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["x"] = (ev["ts"].dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    daily = ev.groupby(["event_type", "x"]).size().rename("y").reset_index()
    for _, row in got.iterrows():
        sub = daily[daily["event_type"] == row["event_type"]]
        x, y = sub["x"].to_numpy(), sub["y"].to_numpy().astype(float)
        ii, jj = np.triu_indices(len(x), k=1)
        slopes = (y[jj] - y[ii]) / (x[jj] - x[ii])
        m = np.quantile(slopes, 0.5)  # linear interpolation, like SQL
        b = np.quantile(y - m * x, 0.5)
        assert abs(row["slope"] - m) < 2e-6
        assert abs(row["intercept"] - b) < 2e-6
        assert row["n_pairs"] == len(slopes)


def test_theil_sen_robust_to_outliers(spark):
    # a clean y=2x+1 series with 20% wild outliers: Theil-Sen
    # recovers the true slope where OLS would not
    rows = [(i, 2 * i + 1 if i % 5 else 500) for i in range(20)]
    df = spark.createDataFrame(
        [("s", x, float(y)) for x, y in rows], ["event_type", "x", "y"]
    )
    from pyspark.sql import functions as F

    a = df.select("event_type", F.col("x").alias("x1"), F.col("y").alias("y1"))
    b = df.select("event_type", F.col("x").alias("x2"), F.col("y").alias("y2"))
    slopes = (
        a.join(b, "event_type")
        .filter(F.col("x1") < F.col("x2"))
        .select(
            ((F.col("y2") - F.col("y1")) / (F.col("x2") - F.col("x1"))).alias(
                "m"
            )
        )
    )
    m = slopes.agg(F.percentile("m", F.lit(0.5))).collect()[0][0]
    assert abs(m - 2.0) < 0.2


def test_late_events_invariants(spark, sf_dir):
    got = X18.q_late_events(spark, sf_dir).toPandas()
    assert (got["n_late"] <= got["n_events"]).all()
    # max lateness, when present, must exceed the watermark delay
    late = got[got["n_late"] > 0]
    assert (late["max_lateness_s"] > X18.LATE_DELAY_S).all()
    clean = got[got["n_late"] == 0]
    assert clean["max_lateness_s"].isna().all()


def test_rrf_fusion_matches_reference(spark, sf_dir):
    got = X18.q_rrf_fusion(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    from fifa_data_pipeline_spark.operators.retrieval import bm25_topk
    from fifa_data_pipeline_spark.sources.io import read_table

    lex = (
        bm25_topk(
            read_table(spark, sf_dir, "documents"),
            X18.BM25_TERMS,
            k=X18.RRF_DEPTH,
        )
        .toPandas()
        .sort_values(["bm25", "doc_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    r1 = {d: i + 1 for i, d in enumerate(lex["doc_id"])}
    prior = docs.sort_values(
        ["n_chars", "doc_id"], ascending=[False, True]
    ).head(X18.RRF_DEPTH)
    r2 = {d: i + 1 for i, d in enumerate(prior["doc_id"])}
    scores = {}
    for d in set(r1) | set(r2):
        scores[d] = (1.0 / (X18.RRF_K + r1[d]) if d in r1 else 0.0) + (
            1.0 / (X18.RRF_K + r2[d]) if d in r2 else 0.0
        )
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(got["doc_id"]) == [d for d, _ in top]
    np.testing.assert_allclose(
        got["rrf"].to_numpy(), [round(s, 6) for _, s in top], atol=1e-9
    )
