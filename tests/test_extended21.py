"""Semantic tests for extended21 (bigram LM, IVM with retractions,
quality fusion) beyond the oracle hash parity."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from fifa_data_pipeline_spark.plans import extended21 as X21


def test_bigram_lm_matches_python_reference(spark, sf_dir):
    got = (
        X21.q_bigram_lm(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = {
        r.doc_id: r.text.strip().split() for r in docs.itertuples()
    }
    from collections import Counter

    c12: Counter = Counter()
    for t in toks.values():
        c12.update(zip(t[:-1], t[1:]))
    c1: Counter = Counter()
    for (w1, _), c in c12.items():
        c1[w1] += c
    v = len(c1)
    k = X21.LM_K
    for doc_id, t in list(toks.items())[:50]:
        bgs = list(zip(t[:-1], t[1:]))
        lps = [
            math.log((c12[b] + k) / (c1[b[0]] + k * v * v)) for b in bgs
        ]
        assert got.loc[doc_id, "n_bigrams"] == len(bgs)
        assert abs(got.loc[doc_id, "avg_logprob"] - np.mean(lps)) < 2e-6
    # higher-probability docs score higher: all logprobs negative
    assert (got["avg_logprob"] < 0).all()


def test_ivm_delta_equals_recompute(spark, sf_dir):
    got = (
        X21.q_ivm_delta(spark, sf_dir)
        .toPandas()
        .set_index("l_returnflag")
        .sort_index()
    )
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    live = li[
        (li["l_shipdate"] < "2000-01-01")
        & ~(
            (li["l_returnflag"] == "R")
            & (li["l_shipdate"].dt.year == 1997)
            & (li["l_shipdate"] < "1999-01-01")
        )
    ]
    ref = live.groupby("l_returnflag")["l_extendedprice"].agg(
        ["count", "sum"]
    )
    assert (got["n"] == ref["count"]).all()
    np.testing.assert_allclose(
        got["sum_price"], ref["sum"].round(2), atol=0.02
    )


def test_quality_fusion_bounds(spark, sf_dir):
    got = X21.q_quality_fusion(spark, sf_dir).toPandas()
    assert (got["n_kept"] <= got["n_docs"]).all()
    assert (got["keep_rate"] >= 0).all() and (got["keep_rate"] <= 1).all()
    # score is bounded by construction: 0.4 + 0.4 + 0.2 = 1.0
    assert (got["avg_score"] <= 1.0 + 1e-9).all()
    assert (got["avg_score"] > 0).all()
