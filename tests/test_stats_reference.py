"""Independent pure-Python references for the exact-statistics
queries (KS, Mann–Whitney, Spearman): the DuckDB oracles prove
cross-engine agreement, but both SQL formulations could share a bug —
these brute-force references (exact Fractions / O(n·m) pair loops)
prove the formulas themselves, on randomized tied samples."""

from __future__ import annotations

import random
import tempfile
from fractions import Fraction


def _ks_query(spark, lens_a, lens_b):
    from fifa_data_pipeline_spark.plans.extended27 import q_ks_test

    rows = [(i, "x", "aa", "s", v) for i, v in enumerate(lens_a)]
    rows += [(1000 + i, "x", "bb", "s", v) for i, v in enumerate(lens_b)]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(f"{d}/documents.parquet")
        (r,) = q_ks_test(spark, d).collect()
    return r


def _mwu_query(spark, lens_a, lens_b):
    from fifa_data_pipeline_spark.plans.extended27 import q_mann_whitney

    rows = [(i, "x", "aa", "s", v) for i, v in enumerate(lens_a)]
    rows += [(1000 + i, "x", "bb", "s", v) for i, v in enumerate(lens_b)]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(f"{d}/documents.parquet")
        (r,) = q_mann_whitney(spark, d).collect()
    return r


def test_ks_matches_bruteforce_on_random_tied_samples(spark):
    rng = random.Random(11)
    for _ in range(3):
        a = [rng.randrange(1, 12) for _ in range(rng.randrange(3, 20))]
        b = [rng.randrange(1, 12) for _ in range(rng.randrange(3, 20))]
        r = _ks_query(spark, a, b)
        n, m = len(a), len(b)
        d_ref = max(
            abs(
                Fraction(sum(1 for x in a if x <= t), n)
                - Fraction(sum(1 for x in b if x <= t), m)
            )
            for t in sorted(set(a) | set(b))
        )
        assert (r.n_a, r.n_b) == (n, m)
        assert Fraction(r.d_num, n * m) == d_ref
        # the half-up micro quotient, recomputed exactly
        num = 2 * r.d_num * 10**6 + n * m
        assert r.d_stat_micro == num // (2 * n * m)


def test_mwu_matches_pair_loop_on_random_tied_samples(spark):
    rng = random.Random(13)
    for _ in range(3):
        a = [rng.randrange(1, 10) for _ in range(rng.randrange(3, 15))]
        b = [rng.randrange(1, 10) for _ in range(rng.randrange(3, 15))]
        r = _mwu_query(spark, a, b)
        # U = #(a > b) + 0.5 * #(a == b), so 2U is the integer
        # pair-loop count with ties worth 1
        u2_ref = sum(
            2 if x > y else (1 if x == y else 0) for x in a for y in b
        )
        assert (r.n_a, r.n_b, r.u2) == (len(a), len(b), u2_ref)


def test_spearman_matches_rank_pearson_reference(spark):
    from fifa_data_pipeline_spark.plans.extended27 import q_spearman

    rng = random.Random(17)
    xs = [float(rng.randrange(1, 8)) for _ in range(25)]
    ys = [float(rng.randrange(1, 8)) for _ in range(25)]
    df = spark.createDataFrame(
        [("G", x, y) for x, y in zip(xs, ys)],
        ["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/lineitem.parquet")
        (r,) = q_spearman(spark, d).collect()

    def avg_ranks(vals):
        order = sorted(vals)
        return [
            (order.index(v) + 1 + len(order) - order[::-1].index(v)) / 2
            for v in vals
        ]

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(v * v for v in rx)
    syy = sum(v * v for v in ry)
    sxy = sum(u * v for u, v in zip(rx, ry))
    num = n * sxy - sx * sy
    den = ((n * sxx - sx * sx) ** 0.5) * ((n * syy - sy * sy) ** 0.5)
    assert abs(r.spearman_rho - num / den) < 2e-6
