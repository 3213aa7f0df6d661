"""End-to-end corpus ETL flow: results equal the oracle-checked
q_corpus_pipeline aggregate, the audit metrics match the data, the
read-back prunes partitions, and a re-run is idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from fifa_data_pipeline_spark.plans.corpus_etl import corpus_etl_flow, read_split
from fifa_data_pipeline_spark.plans.extended8 import q_corpus_pipeline

SF = "/root/testdata/sf0.001"


def test_corpus_etl_end_to_end(spark, tmp_path):
    out = str(tmp_path / "corpus")
    metrics = corpus_etl_flow(spark, SF, out)

    # audit metrics observed during the write match the data read back
    stored = spark.read.parquet(out)
    agg = stored.agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("seq_tokens").alias("total_tokens"),
    ).collect()[0]
    assert metrics["n_seqs"] == agg.n_seqs
    assert metrics["n_docs"] == agg.n_docs
    assert metrics["total_tokens"] == agg.total_tokens

    # per-(split, source) totals equal the oracle-checked registry query
    expected = {
        (r.split, r.source): (r.n_seqs, r.n_docs, r.total_tokens)
        for r in q_corpus_pipeline(spark, SF).collect()
    }
    got = {
        (r.split, r.source): (r.n_seqs, r.n_docs, r.total_tokens)
        for r in stored.groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("seq_tokens").alias("total_tokens"),
        )
        .collect()
    }
    assert got == expected

    # split read-back prunes to one hive partition
    train = read_split(spark, out, "train")
    plan = train._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(split" in plan, plan[:1500]
    assert train.count() == stored.filter("split = 'train'").count() > 0

    # idempotent re-run (CREATE OR REPLACE semantics)
    again = corpus_etl_flow(spark, SF, out)
    assert again == metrics
    assert spark.read.parquet(out).count() == agg.n_seqs


def test_canonicalize_text_agrees_with_duckdb_unicode(spark, duck):
    """Cross-engine check on REAL Unicode (the parquet corpus is
    ASCII, so the evidence lives here): the engine's NFKC + casefold
    + accent strip + whitespace collapse equals DuckDB's
    lower(strip_accents(nfc_normalize(...))) + regexp collapse for
    inputs where NFKC and NFC coincide."""
    from fifa_data_pipeline_spark.operators.text import canonicalize_text

    samples = [
        "Café  au\tlait",
        "É́cole",          # pre-composed + extra combining acute
        "naïve  RÉSUMÉ",
        "  plain ascii  text ",
        "straße",               # ß casefolds to ss
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "id long, text string"
    )
    got = {r.id: r.canon for r in canonicalize_text(df).collect()}
    for i, s in enumerate(samples):
        expect = duck.execute(
            "SELECT trim(regexp_replace(lower(strip_accents("
            "nfc_normalize(?))), '\\s+', ' ', 'g'))",
            [s],
        ).fetchone()[0]
        if s == "straße":
            # casefold (ß->ss) is deliberately STRONGER than lower;
            # DuckDB's lower keeps ß
            assert got[i] == "strasse" and expect == "straße"
        else:
            assert got[i] == expect, (s, got[i], expect)


def test_canonicalize_text_dedups_visual_duplicates(spark):
    from fifa_data_pipeline_spark.operators.text import canonicalize_text

    df = spark.createDataFrame(
        [(1, "Café x"), (2, "Café x"), (3, "cafe  x")],
        "id long, text string",
    )
    out = canonicalize_text(df)
    assert out.select("canon").distinct().count() == 1
