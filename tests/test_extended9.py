"""Unit tests for the round-3b feature-engineering operators
(winsorize, mixture sampling, centroids, int8 quantization, linear
interpolation, EWMA, unigram LM score, chunk dedup)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from fifa_data_pipeline_spark.operators import events as E
from fifa_data_pipeline_spark.operators import relational as R
from fifa_data_pipeline_spark.operators import text as X
from fifa_data_pipeline_spark.operators import vector as V


def test_winsorize_clips_to_exact_fences(spark):
    # values 1..100 in one group: p01 = 1.99, p99 = 99.01 (interpolated)
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 101)], ["g", "v"]
    )
    out = {r.v: (r.clipped, r.was_clipped) for r in R.winsorize(df, "g", "v").collect()}
    assert out[1.0] == (1.99, True)
    assert out[100.0] == (99.01, True)
    assert out[50.0] == (50.0, False)
    assert sum(1 for c, w in out.values() if w) == 2


def test_mixture_sample_upsamples_small_domains(spark):
    rows = [("big", i) for i in range(900)] + [("small", 1000 + i) for i in range(100)]
    df = spark.createDataFrame(rows, ["domain", "id"])
    picked = R.mixture_sample(df, "domain", "id", temperature=0.5, target_frac=0.5)
    counts = {
        r.domain: (r.cnt, r.threshold)
        for r in picked.groupBy("domain", "threshold")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    # τ=0.5 weights: big √900=30, small √100=10 → rates .4167 / 1.25→1
    assert counts["small"][1] == 1000000  # capped at keep-everything
    assert counts["small"][0] == 100
    assert counts["big"][1] == 416666
    # deterministic: rerun identical
    again = {
        r.domain: r.cnt
        for r in R.mixture_sample(df, "domain", "id", 0.5, 0.5)
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert again == {d: c for d, (c, _) in counts.items()}


def test_label_centroids_match_hand_mean(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 3.0]), (0, [3.0, 5.0]), (1, [10.0, 0.0])],
        ["label", "embedding"],
    )
    out = {(r.label, r.dim): (r.centroid, r.n_vecs)
           for r in V.label_centroids(df).collect()}
    assert out[(0, 0)] == (2.0, 2)
    assert out[(0, 1)] == (4.0, 2)
    assert out[(1, 0)] == (10.0, 1)


def test_quantize_int8_roundtrip_bounds(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.003, 0.001, -0.002, 0.004])],
        ["vec_id", "embedding"],
    )
    rows = {r.vec_id: r for r in V.quantize_int8(df).collect()}
    r1 = rows[1]
    assert r1.q_vec[0] == 127 and max(abs(q) for q in r1.q_vec) == 127
    # reconstruction error bounded by scale/2 per element
    assert r1.rmse <= (1.0 / 127) / 2 + 1e-12
    r2 = rows[2]
    assert max(abs(q) for q in r2.q_vec) == 127
    assert abs(r2.scale - 0.004 / 127) < 5e-10  # output rounded to 9dp


def test_interpolate_linear_fills_gap(spark):
    t0 = dt.datetime(2026, 1, 1, 0, 30)
    df = spark.createDataFrame(
        [
            (1, t0, "a", 10.0),
            (2, t0 + dt.timedelta(hours=3), "a", 40.0),
        ],
        ["event_id", "ts", "event_type", "value"],
    )
    out = {
        r.period_s: (r.value_filled, r.observed)
        for r in E.interpolate_linear(df).collect()
    }
    vals = [out[k] for k in sorted(out)]
    assert vals == [(10.0, True), (20.0, False), (30.0, False), (40.0, True)]


def test_interpolate_edges_take_nearest(spark):
    t0 = dt.datetime(2026, 1, 1, 0, 0)
    df = spark.createDataFrame(
        [
            (1, t0, "a", 5.0),
            (2, t0 + dt.timedelta(hours=2), "b", 7.0),
        ],
        ["event_id", "ts", "event_type", "value"],
    )
    out = {
        (r.event_type, r.period_s): r.value_filled
        for r in E.interpolate_linear(df).collect()
    }
    # 'a' observed at hour 0; hours 1-2 extend the last value forward
    # 'b' observed at hour 2; hours 0-1 take the next value backward
    a = [v for (t, _), v in sorted(out.items()) if t == "a"]
    b = [v for (t, _), v in sorted(out.items()) if t == "b"]
    assert a == [5.0, 5.0, 5.0]
    assert b == [7.0, 7.0, 7.0]


def test_ewma_matches_recurrence(spark):
    t0 = dt.datetime(2026, 1, 1)
    vals = [10.0, 20.0, 5.0, 15.0]
    df = spark.createDataFrame(
        [(i, t0 + dt.timedelta(minutes=i), "a", v) for i, v in enumerate(vals)],
        ["event_id", "ts", "event_type", "value"],
    )
    out = [r.ewma for r in E.ewma(df).orderBy("event_id").collect()]
    acc, expect = vals[0], [vals[0]]
    for v in vals[1:]:
        acc = 0.3 * v + 0.7 * acc
        expect.append(round(acc, 6))
    assert out == expect


def test_ewma_lookback_truncates(spark):
    t0 = dt.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [(i, t0 + dt.timedelta(minutes=i), "a", float(i)) for i in range(30)],
        ["event_id", "ts", "event_type", "value"],
    )
    out = [r.ewma for r in E.ewma(df, lookback=20).orderBy("event_id").collect()]
    # row 29's frame starts at value 10, not 0
    acc = 10.0
    for v in range(11, 30):
        acc = 0.3 * v + 0.7 * acc
    assert abs(out[29] - acc) < 1e-6


def test_unigram_logprob_uniform_corpus(spark):
    # two docs, all four tokens distinct → every p = 1/4
    df = spark.createDataFrame(
        [(1, "a b"), (2, "c d")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in X.unigram_logprob(df).collect()}
    expect = round(-math.log(0.25), 6)
    assert out[1].nll == expect and out[1].n_tokens == 2
    assert out[2].nll == expect


def test_unigram_logprob_frequent_tokens_score_lower(spark):
    df = spark.createDataFrame(
        [(1, "x x x x"), (2, "rare1 rare2 rare3 rare4")], ["doc_id", "text"]
    )
    out = {r.doc_id: r.nll for r in X.unigram_logprob(df).collect()}
    assert out[1] < out[2]


def test_jaccard_prefix_join_equals_bruteforce(spark):
    import random

    from fifa_data_pipeline_spark.operators import dedup as D

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(40):
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(12))))
    # planted near-duplicates
    docs.append((100, docs[0][1]))
    docs.append((101, docs[1][1] + " extra"))
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in D.jaccard_prefix_join(df, threshold=0.5).collect()
    }

    sets = df.select("doc_id", X.shingles("text", 3).alias("s"))
    a = sets.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sets.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    jac = F.round(
        F.size(F.array_intersect("sa", "sb"))
        / F.size(F.array_union("sa", "sb")),
        6,
    )
    want = {
        (r.id_a, r.id_b, r.jaccard)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.5)
        .collect()
    }
    assert got == want and len(want) >= 2


def test_label_moments_arrow_matches_numpy(spark):
    import numpy as np

    vecs = [
        (0, [1.0, 2.0]),
        (0, [3.0, 6.0]),
        (1, [0.0, 4.0]),
    ]
    df = spark.createDataFrame(vecs, ["label", "embedding"])
    out = {r.label: r for r in V.label_moments_arrow(df).collect()}
    m0 = np.array([[1.0, 2.0], [3.0, 6.0]])
    mu0 = m0.mean(axis=0)
    assert out[0].n_vecs == 2
    assert abs(out[0].mean_norm - float(np.sqrt((mu0 * mu0).sum()))) < 1e-6
    assert abs(out[0].cov_trace - float(((m0 - mu0) ** 2).mean(axis=0).sum())) < 1e-6
    assert out[1].cov_trace == 0.0


def test_seasonal_anomalies_flags_hour_profile(spark):
    t0 = dt.datetime(2026, 1, 1, 9, 0)
    rows = []
    # hour-9 baseline ~100 across many days, one 200 spike;
    # hour-3 baseline ~10 with a 100 value that a GLOBAL z-score
    # would miss but the hour-profile catches
    for d in range(30):
        rows.append((d, t0 + dt.timedelta(days=d), "a", 100.0 + (d % 3)))
        rows.append((100 + d, t0 + dt.timedelta(days=d, hours=-6), "a", 10.0 + (d % 3)))
    rows.append((500, t0 + dt.timedelta(days=30), "a", 200.0))
    rows.append((501, t0 + dt.timedelta(days=30, hours=-6), "a", 100.0))
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type", "value"])
    out = {r.event_id: r for r in E.seasonal_anomalies(df).collect()}
    assert 500 in out and out[500].hod == 9
    assert 501 in out and out[501].hod == 3
    assert all(e in (500, 501) for e in out)


def test_round3b_ops_on_empty(spark):
    ev = spark.createDataFrame(
        [], "event_id long, ts timestamp, event_type string, value double"
    )
    assert R.winsorize(ev, "event_type", "value").count() == 0
    assert E.ewma(ev).count() == 0
    assert E.interpolate_linear(ev).count() == 0
    assert E.seasonal_anomalies(ev).count() == 0
    docs = spark.createDataFrame([], "doc_id long, text string, source string")
    assert R.mixture_sample(docs, "source", "doc_id").count() == 0
    assert X.unigram_logprob(docs).count() == 0
    from fifa_data_pipeline_spark.operators import dedup as D

    assert D.jaccard_prefix_join(docs).count() == 0
    emb = spark.createDataFrame(
        [],
        "vec_id long, embedding array<double>, label int",
    )
    assert V.label_centroids(emb).count() == 0
    assert V.quantize_int8(emb).count() == 0
    assert V.label_moments_arrow(emb).count() == 0


def test_recursive_chain_closure(spark):
    spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], ["id_a", "id_b"]
    ).createOrReplaceTempView("__dup_pairs")
    out = {
        (r.n, r.m): r.min_hops
        for r in spark.sql(
            """
            WITH RECURSIVE reach(n, m, hops) AS (
              SELECT id_a, id_b, 1 FROM __dup_pairs
              UNION ALL
              SELECT r.n, p.id_b, r.hops + 1
              FROM reach r JOIN __dup_pairs p ON p.id_a = r.m
            )
            SELECT n, m, MIN(hops) AS min_hops FROM reach GROUP BY n, m
            """
        ).collect()
    }
    assert out == {(1, 2): 1, (2, 3): 1, (1, 3): 2, (5, 6): 1}


def _ref_bpe(word_counts, k, min_pair_count=2):
    syms = {w: list(w) for w in word_counts}
    merges = []
    for step in range(k):
        pc = {}
        for w, c in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + c
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_pair_count:
            break
        merges.append((step, a, b, a + b, n))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def test_bpe_train_matches_reference(spark):
    texts = [
        "low low low lower lower lowest",
        "new newer newest new new",
        "wide wider wide widest",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["id", "text"])
    got = [
        (r.step, r.a, r.b, r.merged, r.pair_count)
        for r in X.bpe_train(df, "text", num_merges=8).orderBy("step").collect()
    ]
    wc = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    want = _ref_bpe(wc, 8)
    assert got == want and len(want) >= 4


def test_bpe_train_merge_is_nonoverlapping(spark):
    # "aaaa" x3: merge (a,a)->aa applies left-to-right: [aa, aa],
    # then (aa,aa)->aaaa
    df = spark.createDataFrame([(0, "aaaa aaaa aaaa")], ["id", "text"])
    got = [
        (r.a, r.b, r.pair_count)
        for r in X.bpe_train(df, "text", num_merges=2).orderBy("step").collect()
    ]
    assert got == [("a", "a", 9), ("aa", "aa", 3)]


def test_trimmed_mean_udaf_drops_tails(spark):
    from fifa_data_pipeline_spark.operators import pandas_ops as P

    # 1..10 per group: fences at q10=1.9, q90=9.1 -> keep 2..9
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 11)]
        + [("b", 5.0), ("b", 100.0), ("b", 5.0), ("b", 5.0)],
        ["g", "v"],
    )
    out = {r.g: (r.n, r.trimmed_mean) for r in P.trimmed_mean(df, "g", "v").collect()}
    assert out["a"] == (10, 5.5)
    # b: fences q10=5.0, q90=71.5 -> 100 dropped, mean of three 5s
    assert out["b"] == (4, 5.0)


def test_quantize_int8_zero_vector_safe(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, 0.0, -1.0])], ["vec_id", "embedding"]
    )
    rows = {r.vec_id: r for r in V.quantize_int8(df).collect()}
    assert rows[1].q_vec == [0, 0, 0]
    assert rows[1].scale == 0.0 and rows[1].rmse == 0.0
    assert rows[2].q_vec == [127, 0, -127]


def test_skew_report_identifies_heavy_key(spark):
    rows = [("hot", i) for i in range(80)] + [(f"k{i}", 1000 + i) for i in range(20)]
    df = spark.createDataFrame(rows, ["k", "x"])
    out = R.skew_report(df, ["k"], top_n=3).collect()
    assert out[0].k == "hot" and out[0].n_rows == 80
    assert out[0].row_share == 0.8
    # 21 groups, mean size 100/21; hot is 80/(100/21) = 16.8x
    assert abs(out[0].x_mean_group - 16.8) < 1e-6
    assert len(out) == 3 and out[1].n_rows == 1


def test_sequence_pattern_ordering_and_match(spark):
    t0 = dt.datetime(2026, 3, 1)
    rows = [
        # user 1: view -> click -> purchase (matches, skipping click)
        (1, t0, 1, "view"),
        (2, t0 + dt.timedelta(minutes=1), 1, "click"),
        (3, t0 + dt.timedelta(minutes=2), 1, "purchase"),
        # user 2: purchase before view (no match)
        (4, t0, 2, "purchase"),
        (5, t0 + dt.timedelta(minutes=1), 2, "view"),
        # user 3: same-ts tie broken by event_id: view(6) then purchase(7)
        (6, t0, 3, "view"),
        (7, t0, 3, "purchase"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = {r.user_id: r for r in
           E.sequence_pattern(df, "view>(?:[^>]+>)*?purchase").collect()}
    assert out[1].matched and out[1].first_match == "view>click>purchase"
    assert not out[2].matched and out[2].first_match == ""
    assert out[3].matched and out[3].first_match == "view>purchase"
    assert out[1].n_events == 3


def test_try_cast_null_on_failure(spark):
    df = spark.createDataFrame([("42",), ("nope",), (None,)], ["s"])
    out = [r.v for r in df.select(F.col("s").try_cast("int").alias("v")).collect()]
    assert out == [42, None, None]


def test_map_from_entries_roundtrip(spark):
    df = spark.createDataFrame([("a", 1, 10), ("a", 2, 20)], ["g", "k", "n"])
    m = df.groupBy("g").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("k", "n")))
        ).alias("m")
    )
    back = {(r.g, r.k): r.n for r in m.select("g", F.explode("m").alias("k", "n")).collect()}
    assert back == {("a", 1): 10, ("a", 2): 20}


def test_ewma_parallel_path_matches_funnel_form(spark):
    """Force the partition-parallel EWMA (input large enough that
    every continuing same-key run holds the lookback context with
    num_partitions=4) and pin equality against the single-window
    funnel form — ghosts must reconstruct each partition-start frame
    exactly."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from fifa_data_pipeline_spark.operators.events import ewma

    rows = [
        (i, f"k{i % 3}", float((i * 37) % 101) - 50.0)
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "value"]) \
        .withColumn("ts", F.timestamp_seconds(F.col("event_id") * 60))
    got = {
        r["event_id"]: r["ewma"]
        for r in ewma(df, num_partitions=4).collect()
    }
    alpha, lookback = 0.3, 20
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(lookback - 1), Window.currentRow)
    )
    frame = F.collect_list(F.col("value").cast("double")).over(w)
    folded = F.aggregate(
        F.slice(F.col("__f"), 2, F.greatest(F.size("__f") - 1, F.lit(0))),
        F.element_at("__f", 1),
        lambda acc, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * acc,
    )
    want = {
        r["event_id"]: r["ewma"]
        for r in df.withColumn("__f", frame)
        .withColumn("ewma", F.round(folded, 6))
        .collect()
    }
    assert got == want


def test_ewma_small_input_exact(spark):
    """A tiny input (runs far shorter than the lookback, scattered
    across many range partitions) must still be exact — r7's pooled
    ghosts reconstruct the trailing context by construction, where
    the r6 version needed an eager guard + serial fallback."""
    from pyspark.sql import functions as F

    from fifa_data_pipeline_spark.operators.events import ewma

    df = spark.createDataFrame(
        [(i, "a", float(i)) for i in range(5)],
        ["event_id", "event_type", "value"],
    ).withColumn("ts", F.timestamp_seconds(F.col("event_id")))
    out = {r["event_id"]: r["ewma"] for r in ewma(df).collect()}
    # hand-rolled recurrence
    alpha = 0.3
    e = None
    want = {}
    for i in range(5):
        e = float(i) if e is None else alpha * float(i) + (1 - alpha) * e
        want[i] = round(e, 6)
    assert out == want


def test_ewma_multihop_short_runs_exact(spark):
    """Force runs SHORTER than lookback−1 in the middle partitions
    (the case the r6 guard existed to detect): with num_partitions
    high relative to the data, each partition's same-key run is just
    a few rows, so a row's trailing frame must be stitched from
    MULTIPLE earlier partitions' tails. Pin equality against the
    single-window funnel form."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from fifa_data_pipeline_spark.operators.events import ewma

    alpha, lookback = 0.3, 20
    # 2 keys × 60 rows, 16 partitions → ~7-8 rows per (partition, key)
    # run: every continuing run is far below lookback−1 = 19.
    rows = [(i, f"k{i % 2}", float((i * 17) % 23)) for i in range(120)]
    df = spark.createDataFrame(
        rows, ["event_id", "event_type", "value"]
    ).withColumn("ts", F.timestamp_seconds(F.col("event_id") * 3))
    got = {
        r["event_id"]: r["ewma"]
        for r in ewma(df, num_partitions=16).collect()
    }
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(lookback - 1), Window.currentRow)
    )
    frame = F.collect_list(F.col("value").cast("double")).over(w)
    folded = F.aggregate(
        F.slice(F.col("__f"), 2, F.greatest(F.size("__f") - 1, F.lit(0))),
        F.element_at("__f", 1),
        lambda acc, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * acc,
    )
    want = {
        r["event_id"]: r["ewma"]
        for r in df.withColumn("__f", frame)
        .withColumn("ewma", F.round(folded, 6))
        .collect()
    }
    assert got == want
