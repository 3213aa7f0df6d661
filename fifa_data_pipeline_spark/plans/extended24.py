"""Round-7 anti-entropy + cardinality-sketch operators.

The reference's only integrity surface is BigQuery's own storage
checksums (nothing query-visible; SURVEY.md §2.5); this module
extends the engine-portable fingerprint family (``table_checksum``,
extended23) with the two tools a 100 TB replication/rollup pipeline
actually runs:

- ``q_column_checksums`` — per-COLUMN anti-entropy fingerprints in
  one scan: when two copies of a table disagree, locate WHICH column
  diverged before moving any data (data-diff triage).
- ``q_kmv_distinct`` — KMV k-minimum-values distinct sketch per
  group: the mergeable cardinality sketch with engine-reproducible
  state (min-k md5 hashes), so two engines can cross-verify a
  distinct-count rollup bit-exactly — unlike HLL, whose register
  layouts are implementation-private.

Both DuckDB twins reproduce the md5→BIGINT fold exactly (the same
cross-engine contract the checksum/CMS family established).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fifa_data_pipeline_spark.operators.relational import column_checksums
from fifa_data_pipeline_spark.operators.util import pin
from fifa_data_pipeline_spark.operators.sketch import (
    _cms_fold_duckdb,
    kmv_distinct,
)
from fifa_data_pipeline_spark.sources.io import read_table

_COLS = ["l_orderkey", "l_suppkey", "l_returnflag", "l_linestatus"]


def q_column_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column XOR-fold fingerprints of four lineitem columns in
    ONE pass — the column-granular data-diff companion to
    ``q_table_checksum`` (same canonicalization: null flag + length
    prefix + md5→BIGINT fold, so the DuckDB twin is bit-exact)."""
    li = read_table(spark, sf_dir, "lineitem")
    return column_checksums(li, _COLS)


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user cardinality via the KMV sketch
    (k=64): sketch state is the 64 smallest 60-bit md5 hashes of
    user_id, estimate = (2^60 / h_k) · 63. The oracle recomputes the
    identical sketch in DuckDB — estimates match bit-for-bit because
    the hash and the IEEE arithmetic order are pinned."""
    ev = read_table(spark, sf_dir, "events")
    return kmv_distinct(ev, "event_type", "user_id", k=64)


def _canon_duck(col: str) -> str:
    """DuckDB canonical form of one field: 0/1 null flag + length
    prefix + value (mirror of column_checksums' Spark expression)."""
    return (
        f"CASE WHEN {col} IS NULL THEN '00:' ELSE "
        f"'1' || CAST(length(CAST({col} AS VARCHAR)) AS VARCHAR) "
        f"|| ':' || CAST({col} AS VARCHAR) END"
    )


QUERIES = {
    "q_column_checksums": q_column_checksums,
    "q_kmv_distinct": q_kmv_distinct,
}

ORACLES = {
    "q_column_checksums": f"""
        SELECT COUNT(*) AS n_rows,
               {", ".join(
                   f"bit_xor({_cms_fold_duckdb(_canon_duck(c))})"
                   f" AS {c}_checksum"
                   for c in _COLS
               )}
        FROM lineitem
    """,
    "q_kmv_distinct": f"""
        WITH h AS (
          SELECT DISTINCT event_type,
                 {_cms_fold_duckdb("CAST(user_id AS VARCHAR)")} AS hh
          FROM events WHERE user_id IS NOT NULL
        ), r AS (
          SELECT event_type, hh,
                 ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY hh) AS rn
          FROM h
        ), s AS (
          SELECT event_type,
                 COUNT(*) AS k_eff,
                 MAX(hh) AS kth_min_hash
          FROM r WHERE rn <= 64
          GROUP BY event_type
        )
        SELECT event_type, k_eff, kth_min_hash,
               CAST(CASE WHEN k_eff < 64 THEN k_eff
                    ELSE FLOOR(1152921504606846976.0
                               / CAST(kth_min_hash AS DOUBLE) * 63.0)
               END AS BIGINT) AS distinct_est
        FROM s
    """,
}


# ---------------------------------------------------------------------------
# Label-quality evaluation operators: agreement + calibration. A
# curation pipeline that auto-labels (lang-id, quality classifiers)
# needs to QUANTIFY how much to trust those labels before filtering
# 100 TB on them; kappa and binned calibration are the two standard
# audits. Both are integer-count aggregates until the final division,
# so the DuckDB twins land on bit-identical doubles.
# ---------------------------------------------------------------------------


def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the declared ``lang`` label and the
    stopword-heuristic ``lang_id`` guess — chance-corrected agreement
    (kappa = (p_o − p_e)/(1 − p_e)), the one-number summary of
    q_lang_confusion's matrix. Three tiny aggregates over the cell
    counts (grand total, diagonal, Σ row_k·col_k); the corpus crosses
    one shuffle at the (lang, guess) grain."""
    from pyspark.sql import functions as F

    from fifa_data_pipeline_spark.operators.text import lang_id

    docs = read_table(spark, sf_dir, "documents")
    cells = (
        lang_id(docs)
        .groupBy("lang", "lang_guess")
        .agg(F.count(F.lit(1)).alias("n"))
        # the cell matrix (|langs|² rows) feeds THREE aggregates;
        # without the pin each would re-scan and re-tokenize the
        # whole corpus — at 100 TB that is 3 passes instead of 1
        .transform(pin("ext24"))
    )
    rows_m = cells.groupBy(F.col("lang").alias("k")).agg(
        F.sum("n").alias("r")
    )
    cols_m = cells.groupBy(F.col("lang_guess").alias("k")).agg(
        F.sum("n").alias("c")
    )
    pe_num = (
        rows_m.join(cols_m, "k")
        .agg(F.sum(F.col("r") * F.col("c")).alias("pe_num"))
    )
    base = cells.agg(
        F.sum("n").alias("n_docs"),
        F.sum(
            F.when(F.col("lang") == F.col("lang_guess"), F.col("n"))
            .otherwise(F.lit(0))
        ).alias("agree"),
    )
    po = F.col("agree").cast("double") / F.col("n_docs")
    pe = (
        F.col("pe_num").cast("double")
        / F.col("n_docs")
        / F.col("n_docs")
    )
    return (
        base.crossJoin(F.broadcast(pe_num))
        .select(
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("agree").cast("long").alias("agree"),
            F.round(po, 9).alias("p_observed"),
            F.round(pe, 9).alias("p_expected"),
            F.round((po - pe) / (F.lit(1.0) - pe), 9).alias("kappa"),
        )
    )


def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned calibration audit of the stopword-ratio score as a
    P(lang='en') proxy: decile bins by score, each reporting its doc
    count, empirical 'en' fraction (accuracy), nominal bin-center
    confidence, and the |gap| — the per-bin decomposition of expected
    calibration error. Bin assignment and accuracy derive from
    integer counts only (the per-row score is an int/int division,
    IEEE-identical across engines), so the twin matches bit-exactly;
    the cross-bin ECE sum is deliberately left to the reader to keep
    the result free of order-dependent float accumulation.

    Perf (r10): the per-row counts come from the Arrow/RE2 kernel
    (:func:`text.token_counts_arrow`) instead of the r9 JVM
    split+filter expressions — equality-gated A/B
    (``tools/ab_tokenize.py``): 1.29→1.11 s sf1, 9.20→7.45 s sf10,
    identical integer counts, same one-exchange plan."""
    from pyspark.sql import functions as F

    from fifa_data_pipeline_spark.operators.text import token_counts
    from fifa_data_pipeline_spark.sources.io import (
        footer_uncompressed_bytes,
    )

    docs = read_table(spark, sf_dir, "documents")
    per = token_counts(
        docs.select("lang", "text"),
        ws_alias="__n_tok",
        stop_alias="__stop",
        input_bytes=footer_uncompressed_bytes(
            f"{sf_dir}/documents.parquet"
        ),
    )
    ratio = F.col("__stop") / F.col("__n_tok")
    binned = per.select(
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
            F.round(
                F.col("n_en").cast("double") / F.col("n_docs"), 9
            ).alias("accuracy"),
            F.round((F.col("bin") + F.lit(0.5)) / 10.0, 9).alias(
                "confidence"
            ),
            F.round(
                F.abs(
                    F.col("n_en").cast("double") / F.col("n_docs")
                    - (F.col("bin") + F.lit(0.5)) / 10.0
                ),
                9,
            ).alias("gap"),
        )
    )


QUERIES["q_cohens_kappa"] = q_cohens_kappa
QUERIES["q_calibration_bins"] = q_calibration_bins

from fifa_data_pipeline_spark.plans.extended13 import _STOP_PRED  # noqa: E402

_TOKS24 = "string_split_regex(trim(text), '\\s+')"
_RATIO24 = (
    f"len(list_filter({_TOKS24}, t -> {_STOP_PRED}))"
    f" / len({_TOKS24})"
)

ORACLES["q_cohens_kappa"] = f"""
    WITH g AS (
      SELECT lang,
             CASE WHEN {_RATIO24} >= 0.08
                  THEN 'en' ELSE 'unk' END AS lang_guess
      FROM documents
    ), cells AS (
      SELECT lang, lang_guess, COUNT(*) AS n FROM g GROUP BY 1, 2
    ), rm AS (SELECT lang AS k, SUM(n) AS r FROM cells GROUP BY 1),
    cm AS (SELECT lang_guess AS k, SUM(n) AS c FROM cells GROUP BY 1),
    pe AS (SELECT SUM(r * c) AS pe_num FROM rm JOIN cm USING (k)),
    base AS (
      SELECT SUM(n) AS n_docs,
             SUM(CASE WHEN lang = lang_guess THEN n ELSE 0 END) AS agree
      FROM cells
    )
    SELECT CAST(n_docs AS BIGINT) AS n_docs,
           CAST(agree AS BIGINT) AS agree,
           ROUND(CAST(agree AS DOUBLE) / n_docs, 9) AS p_observed,
           ROUND(CAST(pe_num AS DOUBLE) / n_docs / n_docs, 9)
             AS p_expected,
           ROUND((CAST(agree AS DOUBLE) / n_docs
                  - CAST(pe_num AS DOUBLE) / n_docs / n_docs)
                 / (1.0 - CAST(pe_num AS DOUBLE) / n_docs / n_docs), 9)
             AS kappa
    FROM base, pe
"""

ORACLES["q_calibration_bins"] = f"""
    WITH b AS (
      SELECT CAST(LEAST(FLOOR(({_RATIO24}) * 10), 9) AS BIGINT) AS bin,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en
      FROM documents
    )
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(is_en) AS BIGINT) AS n_en,
           ROUND(CAST(SUM(is_en) AS DOUBLE) / COUNT(*), 9) AS accuracy,
           ROUND((bin + 0.5) / 10.0, 9) AS confidence,
           ROUND(ABS(CAST(SUM(is_en) AS DOUBLE) / COUNT(*)
                     - (bin + 0.5) / 10.0), 9) AS gap
    FROM b GROUP BY bin
"""


def q_fk_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusion-dependency audit over three candidate relationships:
    the two REAL foreign keys (lineitem→orders, orders→customer) must
    report containment 1.0; the deliberately-wrong candidate
    (lineitem.l_suppkey ⊆ part.p_partkey) quantifies how far from an
    FK it is. The schema-inference primitive for undocumented dumps."""
    from pyspark.sql import functions as F  # noqa: F401

    from fifa_data_pipeline_spark.operators.relational import fk_containment

    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    part = read_table(spark, sf_dir, "part")
    probes = [
        fk_containment(li, "l_orderkey", orders, "o_orderkey"),
        fk_containment(orders, "o_custkey", cust, "c_custkey"),
        fk_containment(li, "l_suppkey", part, "p_partkey"),
    ]
    out = probes[0]
    for pr in probes[1:]:
        out = out.unionByName(pr)
    return out


QUERIES["q_fk_discovery"] = q_fk_discovery

_FK_PROBE = """
    SELECT '{rel}' AS relationship,
           (SELECT COUNT(DISTINCT {cc}) FROM {ct} WHERE {cc} IS NOT NULL)
             AS n_child_distinct,
           (SELECT COUNT(DISTINCT {pc}) FROM {pt} WHERE {pc} IS NOT NULL)
             AS n_parent_distinct,
           (SELECT COUNT(*) FROM
              (SELECT DISTINCT {cc} AS v FROM {ct} WHERE {cc} IS NOT NULL) c
              WHERE v IN (SELECT {pc} FROM {pt})) AS n_shared,
           ROUND(
             (SELECT COUNT(*) FROM
                (SELECT DISTINCT {cc} AS v FROM {ct} WHERE {cc} IS NOT NULL) c
                WHERE v IN (SELECT {pc} FROM {pt}))
             / CAST((SELECT COUNT(DISTINCT {cc}) FROM {ct}
                     WHERE {cc} IS NOT NULL) AS DOUBLE), 9) AS containment
"""

ORACLES["q_fk_discovery"] = " UNION ALL ".join(
    _FK_PROBE.format(rel=rel, ct=ct, cc=cc, pt=pt, pc=pc)
    for rel, ct, cc, pt, pc in [
        ("l_orderkey->o_orderkey", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("o_custkey->c_custkey", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("l_suppkey->p_partkey", "lineitem", "l_suppkey",
         "part", "p_partkey"),
    ]
)
