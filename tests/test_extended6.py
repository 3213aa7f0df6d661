"""UDTF contract and PageRank correctness (oracle parity for the
sentence queries is covered by test_oracle_parity)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from fifa_data_pipeline_spark.operators.graph import pagerank
from fifa_data_pipeline_spark.operators.tablefuncs import (
    split_sentences,
    split_sentences_native,
)
from fifa_data_pipeline_spark.plans import extended6 as X6
from fifa_data_pipeline_spark.sources.io import read_table


def _doc_df(spark):
    return spark.createDataFrame(
        [
            (1, "One sentence. Two!  Three? And a fourth"),
            (2, "no punctuation at all"),
            (3, "trailing. "),
            (4, None),
            (5, "..  !? "),
        ],
        "doc_id long, text string",
    )


def test_udtf_splits_punctuated_text(spark):
    rows = sorted(
        map(tuple, split_sentences(spark, _doc_df(spark)).collect())
    )
    # The punctuation run is part of the delimiter (consumed), like
    # any split-based segmenter; trailing delimiters leave no empty row.
    assert rows == [
        (1, 1, "One sentence"),
        (1, 2, "Two"),
        (1, 3, "Three"),
        (1, 4, "And a fourth"),
        (2, 1, "no punctuation at all"),
        (3, 1, "trailing"),
        # doc 4 (NULL) and doc 5 (only separators) yield no rows
    ]


def test_udtf_matches_native_twin(spark):
    df = _doc_df(spark)
    got_udtf = sorted(map(tuple, split_sentences(spark, df).collect()))
    got_native = sorted(map(tuple, split_sentences_native(df).collect()))
    assert got_udtf == got_native


def _numpy_pagerank(edges, d=0.85, n_iter=10):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for a, _ in edges:
        out[ix[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        contrib = np.zeros(n)
        for a, b in edges:
            contrib[ix[b]] += r[ix[a]] / out[ix[a]]
        dangling = r[out == 0].sum()
        r = (1 - d) / n + d * (contrib + dangling / n)
    return {v: r[ix[v]] for v in nodes}


def test_pagerank_matches_numpy_reference(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("e", "d"), ("c", "d"),
        # 'f' is dangling (no out-edges)
        ("a", "f"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.rank for r in pagerank(df, n_iter=10).collect()}
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    for v, w in want.items():
        assert abs(got[v] - w) < 1e-9, (v, got[v], w)


def test_pagerank_mass_conserved_on_purchase_graph(spark, sf_dir):
    ranks = X6.q_pagerank(spark, sf_dir)
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-3  # 6-dp rounding noise only
    assert ranks.filter(F.col("rank") <= 0).count() == 0
    # Suppliers sit downstream of every customer->part edge; their
    # mean rank must exceed the uniform floor contributed by teleport.
    n = ranks.count()
    supp_mean = (
        ranks.filter(F.col("node").startswith("s:")).agg(F.avg("rank")).collect()[0][0]
    )
    assert supp_mean > (1.0 - 0.85) / n


def test_event_transition_probabilities_normalize(spark, sf_dir):
    rows = X6.q_event_transitions(spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.event_type, 0.0)
        by_src[r.event_type] += r.p
        assert r.n > 0
    for src, total in by_src.items():
        assert abs(total - 1.0) < 1e-4, src


def test_rolling_range_frame_includes_current_row(spark, sf_dir):
    df = X6.q_rolling_range(spark, sf_dir)
    # The 30-day frame always contains the current order, so the
    # rolling spend is bounded below by any single order's price —
    # check via the first_price column on single-order customers and
    # the generic non-null/positive invariants.
    assert df.filter(F.col("spend_30d") <= 0).count() == 0
    one = (
        df.groupBy("o_custkey").count().filter(F.col("count") == 1)
        .limit(1).collect()
    )
    if one:
        k = one[0].o_custkey
        r = df.filter(F.col("o_custkey") == k).collect()[0]
        assert r.spend_30d == round(r.first_price, 4)
        assert r.second_price is None


def test_fuzzy_name_pairs_blocking_and_threshold(spark):
    from fifa_data_pipeline_spark.operators.dedup import fuzzy_name_pairs

    df = spark.createDataFrame(
        [
            (1, "red widget"),
            (2, "rad widget"),     # dist 1 to red widget
            (3, "small widget"),   # same block, dist > 2 from both
            (4, "red gadget"),     # different block — never compared
        ],
        "id long, name string",
    )
    pairs = sorted(
        map(
            tuple,
            fuzzy_name_pairs(
                df, "name", F.element_at(F.split("name", " "), -1)
            ).collect(),
        )
    )
    assert pairs == [("rad widget", "red widget", 1)]


def test_snapshot_diff_classification(spark):
    from fifa_data_pipeline_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, name string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 25.0), (3, "c", 30.0), (5, "e", 50.0)],
        "k long, name string, v double",
    )
    got = {r.k: r.change_type for r in snapshot_diff(old, new, "k").collect()}
    # 1 unchanged (absent), 2 changed, 3 NULL->value counts as changed,
    # 4 removed, 5 added.
    assert got == {2: "changed", 3: "changed", 4: "removed", 5: "added"}


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from fifa_data_pipeline_spark.sources.io import compact_parquet, read_table

    path = str(tmp_path / "fragmented")
    src = read_table(spark, "/root/testdata/sf0.001", "orders")
    src.repartition(64).write.parquet(path)  # simulate streaming small files
    import pathlib

    before = len(list(pathlib.Path(path).rglob("*.parquet")))
    assert before >= 32
    want = sorted(map(tuple, spark.read.parquet(path).collect()))
    n_files = compact_parquet(spark, path, target_file_bytes=64 * 1024 * 1024)
    after = len(list(pathlib.Path(path).rglob("*.parquet")))
    assert after == n_files < before
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == want


def test_ltv_deciles_partition_and_monotonic(spark, sf_dir):
    rows = sorted(
        X6.q_ltv_deciles(spark, sf_dir).collect(), key=lambda r: r.decile
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    n_cust = (
        read_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    # Decile 1 holds the biggest spenders: totals non-increasing.
    spends = [r.total_spend / r.n_customers for r in rows]
    assert all(a >= b for a, b in zip(spends, spends[1:]))
