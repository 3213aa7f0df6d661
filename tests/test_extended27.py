"""Unit semantics for the Zipf-fit corpus statistic (extended27).

The oracle-parity sweep already hash-checks q_zipf_fit against
DuckDB; here the slope itself is pinned on constructed inputs."""

from __future__ import annotations

import math

from fifa_data_pipeline_spark.operators.text import zipf_fit
from fifa_data_pipeline_spark.plans.extended27 import q_zipf_fit


def _fit(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    return {r[0]: r for r in zipf_fit(df, "source", "text").collect()}


def test_exact_zipf_corpus_has_slope_minus_one(spark):
    """freq(rank r) = 12/r for ranks 1..4 (12, 6, 4, 3) lies exactly
    on a -1 power law, so the OLS slope in log-log space is -1 and
    r2 = 1."""
    text = " ".join(["a"] * 12 + ["b"] * 6 + ["c"] * 4 + ["d"] * 3)
    r = _fit(spark, [(1, text, "web")])["web"]
    assert r.n_types == 4 and r.n_tokens == 25
    assert math.isclose(r.zipf_slope, -1.0, abs_tol=1e-9)
    assert math.isclose(r.r2, 1.0, abs_tol=1e-9)


def test_uniform_corpus_has_slope_zero(spark):
    """All types equally frequent: ln(freq) is constant, slope 0."""
    r = _fit(spark, [(1, "a a b b c c d d", "uni")])["uni"]
    assert r.n_types == 4 and r.n_tokens == 8
    assert r.zipf_slope == 0.0


def test_groups_fit_independently(spark):
    """Each group gets its own frequency table and rank space."""
    out = _fit(
        spark,
        [
            (1, "a a a a b b c d", "skewed"),
            (2, "x x y y", "flat"),
        ],
    )
    assert out["skewed"].zipf_slope < -0.5
    assert out["flat"].zipf_slope == 0.0


def test_query_form_runs_on_testdata(spark, sf_dir):
    rows = q_zipf_fit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_types > 0 and r.n_tokens >= r.n_types
        # frequency is non-increasing in rank, so the fit slope
        # cannot be positive on any real token table
        assert r.zipf_slope <= 0.0
