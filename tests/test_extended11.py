"""Unit tests for the round-4 batch-2 operators (extended11)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_windowed_distinct_brute_force(spark, sf_dir):
    from fifa_data_pipeline_spark.plans.extended11 import q_windowed_distinct

    got = {
        (r["day"], r["users_7d"])
        for r in q_windowed_distinct(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    du = {
        (r["d"], r["user_id"])
        for r in ev.select(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("d"),
            "user_id",
        ).collect()
    }
    days = {d for d, _ in du}
    brute = {
        (d, len({u for (dd, u) in du if d - 6 <= dd <= d})) for d in days
    }
    assert got == brute


def test_bitmap_distinct_equals_count_distinct(spark, sf_dir):
    from fifa_data_pipeline_spark.plans.extended11 import q_bitmap_distinct

    got = {
        (r["event_type"], r["n_users"])
        for r in q_bitmap_distinct(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        (r["event_type"], r["n"])
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert got == exact


def test_attribution_window_semantics(spark):
    from fifa_data_pipeline_spark.operators.relational import as_of_join

    purchases = spark.createDataFrame(
        [(1, 1, 1000), (2, 1, 200000), (3, 2, 500)],
        "event_id long, user_id long, ep long",
    )
    touches = spark.createDataFrame(
        [(1, 900, "view"), (1, 950, "click"), (2, 600, "view")],
        "user_id long, tep long, channel string",
    )
    j = as_of_join(purchases, touches, "user_id", "ep", "tep", ["channel", "tep"])
    rows = {r["event_id"]: (r["prior_channel"], r["prior_tep"]) for r in j.collect()}
    # purchase 1: latest touch at 950 (click) wins over 900 (view)
    assert rows[1] == ("click", 950)
    # purchase 2: touch exists but 199050s earlier -> filtered by 24h rule
    assert rows[2] == ("click", 950)
    assert 200000 - rows[2][1] > 86400
    # purchase 3 at 500 precedes user 2's only touch at 600 -> no match
    assert rows[3] == (None, None)


def test_doc_similarity_symmetric_bounds(spark, sf_dir):
    from fifa_data_pipeline_spark.plans.extended11 import q_doc_similarity

    rows = q_doc_similarity(spark, sf_dir).collect()
    assert rows, "synthetic corpus should contain near-dup pairs"
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert 0.85 <= r["cos_sim"] <= 1.000001


def test_dedup_keep_best_winner_is_longest(spark, sf_dir):
    from fifa_data_pipeline_spark.plans.extended11 import q_dedup_keep_best

    kept = q_dedup_keep_best(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["n_chars"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 200)
        .collect()
    }
    # exactly one winner per component; every doc accounted for
    assert len({r["component"] for r in kept}) == len(kept)
    assert sum(r["n_members"] for r in kept) == len(docs)
    for r in kept:
        assert docs[r["kept_doc_id"]] == r["kept_chars"]
        # winner at least as long as its own component label doc
        assert r["kept_chars"] >= docs[r["component"]]
