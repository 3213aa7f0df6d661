"""Semantic tests for extended17 (survival, drift, balancing, rules,
rolling correlation) beyond the oracle hash parity."""

from __future__ import annotations

import numpy as np
import pandas as pd

from fifa_data_pipeline_spark.plans import extended17 as X17


def test_km_survival_matches_numpy_reference(spark, sf_dir):
    got = (
        X17.q_survival_km(spark, sf_dir)
        .toPandas()
        .sort_values("duration_days")
        .reset_index(drop=True)
    )
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    per = orders.groupby("o_custkey")["o_orderdate"].agg(["min", "max"])
    end = orders["o_orderdate"].max()
    dur = (per["max"] - per["min"]).dt.days.to_numpy()
    ev = (
        per["max"] < end - pd.Timedelta(days=X17.KM_HORIZON_DAYS)
    ).to_numpy()
    # classic KM: iterate distinct event times ascending
    s = 1.0
    rows = []
    for t in np.unique(dur[ev]):
        n = int((dur >= t).sum())
        d = int(((dur == t) & ev).sum())
        s *= 1 - d / n
        rows.append((t, d, n, s))
    ref = pd.DataFrame(
        rows, columns=["duration_days", "n_events", "n_risk", "survival"]
    )
    assert len(got) == len(ref)
    assert (got["n_risk"].to_numpy() == ref["n_risk"].to_numpy()).all()
    assert (got["n_events"].to_numpy() == ref["n_events"].to_numpy()).all()
    np.testing.assert_allclose(
        got["survival"].to_numpy(), ref["survival"].to_numpy(), atol=2e-6
    )
    # survival is non-increasing and within (0, 1]
    sv = got["survival"].to_numpy()
    assert (np.diff(sv) <= 1e-12).all()
    assert sv.min() > 0 and sv.max() <= 1.0


def test_kl_drift_nonnegative(spark, sf_dir):
    got = X17.q_kl_drift(spark, sf_dir).toPandas()
    assert len(got) == 20
    # Gibbs' inequality: smoothed KL is >= 0 (allow FP slack at 0)
    assert (got["kl_vs_corpus"] >= -1e-9).all()
    assert (got["n_tokens"] > 0).all()


def test_domain_cap_invariants(spark, sf_dir):
    got = X17.q_domain_cap(spark, sf_dir).toPandas()
    assert (got["n_kept"] <= X17.DOMAIN_CAP).all()
    assert (got["n_kept"] + got["n_dropped"] == got["n_docs"]).all()
    capped = got[got["n_docs"] > X17.DOMAIN_CAP]
    assert (capped["n_kept"] == X17.DOMAIN_CAP).all()


def test_weighted_quantile_matches_numpy(spark, sf_dir):
    got = X17.q_weighted_quantile(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    docs["w"] = docs["text"].str.strip().str.split().str.len()
    for _, row in got.iterrows():
        sub = docs[docs["lang"] == row["lang"]].sort_values(
            ["n_chars", "doc_id"]
        )
        cum = sub["w"].cumsum().to_numpy()
        tot = cum[-1]
        vals = sub["n_chars"].to_numpy()
        assert row["w_median_chars"] == vals[np.argmax(cum >= 0.5 * tot)]
        assert row["w_p90_chars"] == vals[np.argmax(cum >= 0.9 * tot)]
        assert row["total_tokens"] == tot


def test_assoc_rules_identities(spark, sf_dir):
    got = X17.q_assoc_rules(spark, sf_dir).toPandas()
    lift = {
        (r["antecedent"], r["consequent"]): r["lift"]
        for _, r in got.iterrows()
    }
    for (a, b), v in lift.items():
        assert abs(v - lift[(b, a)]) < 1e-9  # lift is symmetric
    assert (got["support"] <= got["confidence"] + 1e-12).all()
    assert (got["confidence"] <= 1.0 + 1e-12).all()
    assert (got["support"] > 0).all()


def test_rolling_corr_matches_pandas(spark, sf_dir):
    got = (
        X17.q_rolling_corr(spark, sf_dir)
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev["event_type"].isin(["click", "error"])].copy()
    ev["day"] = ev["ts"].dt.date
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    daily = ev.pivot_table(
        index="day", columns="event_type", values="cents", aggfunc="sum"
    ).dropna()
    roll = (
        daily["click"].rolling(X17.CORR_DAYS).corr(daily["error"])
    ).dropna()
    assert len(got) == len(roll)
    np.testing.assert_allclose(
        got["corr_14d"].to_numpy(), roll.to_numpy(), atol=2e-6
    )
    assert got["corr_14d"].abs().max() <= 1.0 + 1e-9


def test_pca_project_matches_numpy(spark, sf_dir):
    got = (
        X17.q_pca_project(spark, sf_dir)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values(
        "vec_id"
    )
    x = np.vstack(emb["embedding"].to_numpy()).astype(np.float64)
    xc = x - x.mean(axis=0)
    cov = (xc.T @ xc) / (len(x) - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:2]
    comps = evecs[:, order].T
    for i in range(2):
        if comps[i][np.argmax(np.abs(comps[i]))] < 0:
            comps[i] = -comps[i]
    ref = xc @ comps.T
    np.testing.assert_allclose(
        got[["pc1", "pc2"]].to_numpy(), ref, atol=5e-4
    )
    # variance along pc1 >= along pc2 (top component first)
    assert got["pc1"].var() >= got["pc2"].var()
