"""A/B: java.util.regex tokenize floor vs an Arrow/RE2 kernel.

The weak-trio adjudication (q_tokenizer_fertility, q_calibration_bins,
q_budget_select) says each query ≈ one corpus tokenize pass and the
5-7×/byte gap vs DuckDB is java.util.regex vs RE2 — with "no plan-
shape fix". This measures the one engine-level alternative the r9
verdict flagged as unmeasured: ``mapInArrow`` +
``pyarrow.compute.count_substring_regex`` (pyarrow's regex IS RE2) on
the already-projected text column, paying one Arrow IPC round-trip to
buy the faster per-byte regex engine.

Usage::

    python tools/ab_tokenize.py <sf_dir>

Prints one JSON line with min-of-3 warm seconds per variant plus a
cross-variant result-equality check (the Arrow kernels must produce
bit-identical integer counts or the A/B is void).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from fifa_data_pipeline_spark.operators import text as X  # noqa: E402
from fifa_data_pipeline_spark.session import get_spark  # noqa: E402
from fifa_data_pipeline_spark.sources.io import read_table  # noqa: E402

BPE_PAT = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def arrow_fertility(spark, sf_dir):
    """q_tokenizer_fertility with the per-row counts computed by an
    Arrow/RE2 kernel instead of JVM regexp_count."""
    import pyarrow as pa

    docs = read_table(spark, sf_dir, "documents").select("lang", "text")
    out_schema = "lang string, __chars long, __toks long"

    def kernel(batches):
        import pyarrow.compute as pc

        for b in batches:
            t = b.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("lang"),
                    pc.cast(pc.utf8_length(t), pa.int64()),
                    pc.cast(
                        pc.count_substring_regex(t, BPE_PAT), pa.int64()
                    ),
                ],
                ["lang", "__chars", "__toks"],
            )

    per = docs.mapInArrow(kernel, out_schema)
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__toks").alias("total_tokens"),
        F.round(F.sum("__chars") / F.sum("__toks"), 6).alias(
            "chars_per_token"
        ),
        F.round(F.sum("__toks") / F.count(F.lit(1)), 6).alias(
            "tokens_per_doc"
        ),
    )


def spark_fertility(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        F.length("text").cast("bigint").alias("__chars"),
        X.bpe_ish_token_count_expr("text").alias("__toks"),
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__toks").alias("total_tokens"),
        F.round(F.sum("__chars") / F.sum("__toks"), 6).alias(
            "chars_per_token"
        ),
        F.round(F.sum("__toks") / F.count(F.lit(1)), 6).alias(
            "tokens_per_doc"
        ),
    )


def jvm_calibration(spark, sf_dir):
    """The pre-r10 JVM form of q_calibration_bins (split + HOF
    filter on java.util.regex) — kept standalone so the A/B remains
    reproducible now that the registry entry IS the Arrow form."""
    from fifa_data_pipeline_spark.operators.text import STOPWORDS, tokens

    docs = read_table(spark, sf_dir, "documents")
    toks = tokens("text")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    ).cast("bigint")
    ratio = stop_hits / F.size(toks).cast("bigint")
    binned = docs.select(
        F.least(F.floor(ratio * 10), F.lit(9)).cast("long").alias("bin"),
        (F.col("lang") == "en").cast("long").alias("is_en"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("is_en").alias("n_en"),
        )
        .select(
            "bin",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_en").cast("long").alias("n_en"),
        )
    )


def arrow_calibration_replace_pad(spark, sf_dir):
    """The MEASURED-AND-REJECTED Arrow stop-count variant (r10):
    whole-token equality without lookahead by widening whitespace
    runs to two spaces, padding both ends, and counting
    ``' (the|a) '``. Correct (equality-gated) but ~50% slower at
    sf10 than the adopted split+bincount kernel (7.5 vs 4.9 s) —
    kept so the negative result is reproducible."""
    import pyarrow as pa

    docs = read_table(spark, sf_dir, "documents").select("lang", "text")
    out_schema = "is_en long, n_tokens long, stop_hits long"

    def kernel(batches):
        import pyarrow.compute as pc

        for b in batches:
            t = pc.utf8_trim_whitespace(b.column("text"))
            n_tok = pc.add(
                pc.count_substring_regex(t, r"\s+"), 1
            )
            wide = pc.replace_substring_regex(t, r"\s+", "  ")
            pad = pc.binary_join_element_wise(" ", wide, " ", "")
            stop = pc.count_substring_regex(pad, r" (the|a) ")
            is_en = pc.cast(
                pc.equal(b.column("lang"), "en"), pa.int64()
            )
            yield pa.RecordBatch.from_arrays(
                [
                    is_en,
                    pc.cast(n_tok, pa.int64()),
                    pc.cast(stop, pa.int64()),
                ],
                ["is_en", "n_tokens", "stop_hits"],
            )

    per = docs.mapInArrow(kernel, out_schema)
    ratio = F.col("stop_hits") / F.col("n_tokens")
    binned = per.select(
        F.least(F.floor(ratio * 10), F.lit(9)).cast("long").alias("bin"),
        "is_en",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("is_en").alias("n_en"),
        )
        .select(
            "bin",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_en").cast("long").alias("n_en"),
        )
    )


def main() -> int:
    sf_dir = sys.argv[1]
    spark = get_spark("ab-tokenize")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    def run(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # heavy warmup (RUNBOOK §5: first-query-in-session is 3-5× slow)
    run(queries["q_flagship"](spark, sf_dir))
    run(spark_fertility(spark, sf_dir))

    import gc

    jvm = spark.sparkContext._jvm

    def gc_both():
        gc.collect()
        jvm.System.gc()

    variants = {
        "jvm_fertility": lambda: spark_fertility(spark, sf_dir),
        "arrow_fertility": lambda: arrow_fertility(spark, sf_dir),
        "jvm_calibration": lambda: jvm_calibration(spark, sf_dir),
        "arrow_calibration_rejected": lambda: (
            arrow_calibration_replace_pad(spark, sf_dir)
        ),
        "arrow_calibration_adopted": lambda: queries[
            "q_calibration_bins"
        ](spark, sf_dir),
    }
    out = {}
    for name, mk in variants.items():
        runs = []
        for _ in range(3):
            runs.append(run(mk()))
            gc_both()
        out[name] = round(min(runs), 4)

    # equality gates: Arrow counts must match the JVM counts exactly
    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    eq_fert = rows(spark_fertility(spark, sf_dir)) == rows(
        arrow_fertility(spark, sf_dir)
    )
    eq_cal = rows(jvm_calibration(spark, sf_dir)) == rows(
        arrow_calibration_replace_pad(spark, sf_dir)
    )
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "times": out,
                "equal_fertility": eq_fert,
                "equal_calibration": eq_cal,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
