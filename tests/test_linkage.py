"""Fellegi-Sunter linkage unit tests: exact u-probabilities, weight
signs, three-way decisions, and the blocking contract."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fifa_data_pipeline_spark.operators.linkage import (
    field_u_probability,
    fs_link,
)


def test_field_u_probability_exact(spark):
    a = spark.createDataFrame([("x",), ("x",), ("y",), (None,)], ["c"])
    b = spark.createDataFrame([("x",), ("y",), ("y",), ("z",)], ["c"])
    u = field_u_probability(a, b, "c").collect()[0].u
    # hits = 2*1 (x) + 1*2 (y) = 4; NA*NB = 16 (NULL rows count in
    # totals but never agree)
    assert abs(u - 4 / 16) < 1e-12


def test_fs_link_weights_and_decisions(spark):
    a = spark.createDataFrame(
        [(1, "alice", "A", "b1"), (2, "bob", "B", "b1")],
        ["rid", "name", "seg", "blk"],
    )
    b = spark.createDataFrame(
        [(11, "alice", "A", "b1"), (12, "carol", "B", "b1")],
        ["rid", "name", "seg", "blk"],
    )
    out = {
        (r.id_a, r.id_b): r
        for r in fs_link(
            a, b, "rid", "rid", "blk",
            [("name", 0.9), ("seg", 0.8)], lower=0.0, upper=1.5,
        ).collect()
    }
    assert len(out) == 4  # one block -> 2x2 candidate pairs
    # u_name = (1*1 + 0 + 0) / 4 = 0.25 ; u_seg = (1 + 1) / 4 = 0.5
    w_match = math.log(0.9 / 0.25) + math.log(0.8 / 0.5)
    got = out[(1, 11)]
    assert got.agree_name and got.agree_seg
    assert abs(got.weight - round(w_match, 6)) < 1e-6
    assert got.decision == "match"
    w_miss = math.log(0.1 / 0.75) + math.log(0.2 / 0.5)
    got = out[(2, 11)]  # bob vs alice: disagree both
    assert not got.agree_name and not got.agree_seg
    assert abs(got.weight - round(w_miss, 6)) < 1e-6
    assert got.decision == "non_match"
    # bob vs carol: names differ, segment agrees -> middle band
    mid = out[(2, 12)]
    assert (not mid.agree_name) and mid.agree_seg
    assert mid.decision in ("possible", "non_match")


def test_fs_link_blocking_is_equi_join(spark):
    """No cartesian/BNLJ: candidate generation must be a hash join
    on the block key."""
    a = spark.createDataFrame(
        [(i, f"n{i}", "s", f"b{i % 3}") for i in range(30)],
        ["rid", "name", "seg", "blk"],
    )
    out = fs_link(a, a, "rid", "rid", "blk", [("name", 0.9)])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    rows = out.count()
    assert rows == 3 * 10 * 10  # within-block pairs only


def test_fs_link_zero_overlap_field_stays_finite(spark):
    """A field with ZERO cross-frame value overlap gives u = 0; the
    eps clamp must keep ln(m/u) finite (not NULL under non-ANSI /
    an error under ANSI) and the decision well-defined (ADVICE r5)."""
    a = spark.createDataFrame(
        [(1, "alice", "b0"), (2, "bob", "b0")], ["rid", "name", "blk"]
    )
    b = spark.createDataFrame(
        [(11, "carol", "b0"), (12, "dave", "b0")], ["rid", "name", "blk"]
    )
    out = fs_link(a, b, "rid", "rid", "blk", [("name", 0.9)]).collect()
    assert len(out) == 4
    for r in out:
        assert r.weight is not None
        assert math.isfinite(r.weight)
        assert r.decision in ("match", "possible", "non_match")


def test_fs_pattern_report_matches_pairwise_rollup(spark):
    """The inclusion-exclusion pattern report must equal the per-pair
    fs_link aggregated to the same grain — including NULL fields
    (never agree) and duplicate values within a block."""
    from fifa_data_pipeline_spark.operators.linkage import (
        fs_pattern_report,
    )

    a = spark.createDataFrame(
        [(1, "x", "s1", "b0"), (2, "y", None, "b0"),
         (3, "x", "s2", "b0"), (4, "z", "s1", "b1"),
         (5, "z", "s1", "b1")],
        ["rid", "name", "seg", "blk"],
    )
    b = spark.createDataFrame(
        [(11, "x", "s1", "b0"), (12, "y", "s2", "b0"),
         (13, None, "s1", "b1"), (14, "z", "s1", "b1")],
        ["rid", "name", "seg", "blk"],
    )
    fields = [("name", 0.9), ("seg", 0.8)]
    per_pair = (
        fs_link(a, b, "rid", "rid", "blk", fields)
        .groupBy("decision", "agree_name", "agree_seg")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.min("weight"), 6).alias("min_weight"),
            F.round(F.max("weight"), 6).alias("max_weight"),
        )
    )
    report = fs_pattern_report(a, b, "blk", fields)
    got = sorted(map(tuple, report.collect()))
    want = sorted(map(tuple, per_pair.collect()))
    assert got == want
