"""End-to-end TRAINING-CORPUS ETL flow — the north-star counterpart
of :mod:`plans.etl_flow` (which mirrors the reference's orchestrated
pipeline, ``etl_kaggle_to_big_query.py:207-225``): one idempotent
function from raw documents to training-ready packed sequences in a
split-partitioned store, composed entirely from the engine's
operators:

1. exact dedup (fingerprint window-min, the single-shuffle form)
2. quality filter (token floor)
3. benchmark decontamination (4-gram overlap vs the eval slice)
4. deterministic content-addressed 90/5/5 split
5. 2048-token sequence packing per (split, source)
6. audited, split-partitioned parquet write (observe() metrics
   accumulate during the write — zero extra scans)
7. read-back of one split relies on hive partition pruning (asserted
   in the test: the train scan's plan touches only split=train)

Scale posture: stages 1-5 inherit the shapes documented per-operator
in SCALE.md (per-row projections + one fp window + one broadcast
gram join + one pack window); the write shuffles once on the
partition column; downstream consumers prune by split for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fifa_data_pipeline_spark.operators import relational as R
from fifa_data_pipeline_spark.operators import text as X
from fifa_data_pipeline_spark.sources.io import read_table, write_with_audit


def corpus_etl_flow(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict:
    """Run the corpus ETL end-to-end; returns the audit metrics
    observed during the final write (doc/sequence/token totals)."""
    docs = read_table(spark, sf_dir, "documents")
    benchmark = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)

    w = Window.partitionBy("__fp")
    deduped = (
        corpus.withColumn("__fp", F.md5(F.lower(F.trim(F.col("text")))))
        .withColumn("__min_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("__min_id"))
        .drop("__fp", "__min_id")
    )
    quality = deduped.filter(X.token_count_expr("text") >= 10)
    contaminated = X.decontaminate(corpus, benchmark, "doc_id", "text", n=4)
    clean = quality.join(contaminated.select("doc_id"), "doc_id", "left_anti")
    split_docs = R.hash_split(clean, "doc_id")
    seqs = X.pack_sequences(
        split_docs, "doc_id", "text", ["split", "source"], capacity=2048
    )
    metrics = write_with_audit(
        seqs.repartition("split"),
        out_dir,
        {
            "n_seqs": F.count(F.lit(1)),
            "n_docs": F.sum("n_docs"),
            "total_tokens": F.sum("seq_tokens"),
        },
        partition_by=["split"],
    )
    return metrics


def read_split(spark: SparkSession, out_dir: str, split: str) -> DataFrame:
    """Read one split back; the ``split=...`` predicate prunes to one
    hive partition directory (asserted in the test)."""
    return spark.read.parquet(out_dir).filter(F.col("split") == split)
