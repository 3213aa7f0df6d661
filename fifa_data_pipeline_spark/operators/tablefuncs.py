"""Python UDTF (user-defined table function) surface.

A UDTF is the one-to-many extension point: one input row → any number
of output rows, with the output schema declared up front. Rules of
engagement mirror ``pandas_ops``: built-in generators first
(``explode``/``posexplode`` over an array expression cover the
common cases JVM-side — the equality test pins this UDTF against
exactly that native form); a UDTF earns its place when the per-row
expansion needs real Python (a tokenizer library, a parser, a model).

Scale: UDTFs run per-partition in a Python worker (Arrow-batched in
Spark 4) with no shuffle — embarrassingly parallel like any per-row
map; the Python-worker hop is the cost, same as any Python UDF.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fifa_data_pipeline_spark.operators.util import exploded
from pyspark.sql.functions import udtf

#: Default segment boundary: sentence punctuation run + whitespace.
#: RE2-compatible (no lookaround) so the DuckDB oracle can use the
#: IDENTICAL pattern with string_split_regex.
SENT_SPLIT = r"[.!?]+\s+"


@udtf(returnType="sent_idx int, sentence string")
class SplitSentences:
    """One row per text segment, 1-based index; empty/whitespace-only
    fragments dropped. The boundary pattern arrives as a (constant)
    second argument — UDTF instances are constructed per task, so
    configuration travels through the call, not the constructor."""

    def eval(self, text: str, pattern: str):  # noqa: D102 (fixed contract)
        if text is None:
            return
        idx = 0
        for frag in re.split(pattern, text):
            frag = frag.strip()
            if frag:
                idx += 1
                yield (idx, frag)


def split_sentences(
    spark: SparkSession,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = SENT_SPLIT,
) -> DataFrame:
    """Apply the segment-splitter UDTF laterally: (id, sent_idx,
    sentence) — SQL ``LATERAL`` join against the registered table
    function, the idiomatic invocation shape."""
    spark.udtf.register("split_sentences_udtf", SplitSentences)
    df.select(id_col, text_col).createOrReplaceTempView("__split_in")
    # Spark SQL string literals process backslash escapes ('\s' -> 's'
    # unless escapedStringLiterals is set) — double them, then double
    # quotes, so the Python worker receives the pattern verbatim.
    quoted = pattern.replace("\\", "\\\\").replace("'", "''")
    return spark.sql(
        f"""
        SELECT i.{id_col}, s.sent_idx, s.sentence
        FROM __split_in i, LATERAL split_sentences_udtf(i.{text_col}, '{quoted}') s
        """
    )


def split_sentences_native(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    pattern: str = SENT_SPLIT,
) -> DataFrame:
    """The JVM-native twin: trim/filter the fragment ARRAY with
    higher-order functions, then one posexplode — same rows as the
    UDTF with zero shuffle and no Python worker. This is what a
    production pipeline should ship for THIS case; the pair exists to
    prove the UDTF contract and to measure the Python-hop cost
    honestly."""
    arr = F.filter(
        F.transform(F.split(F.col(text_col), pattern), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    return exploded(
        df, arr, "sentence", keep=[id_col], pos_alias="__i"
    ).select(
        id_col,
        (F.col("__i") + 1).cast("int").alias("sent_idx"),
        "sentence",
    )


#: Bounded per-partition state size for TopKPerPartition.
TOPK_K = 2


@udtf(returnType="doc_id bigint, n_chars bigint, rank int")
class TopKPerPartition:
    """Polymorphic UDTF over a TABLE argument: consumes every row of
    its input partition (``eval`` per row), keeps a bounded top-k by
    ``n_chars`` (doc_id tie-break), and emits it in ``terminate`` —
    the aggregate-shaped UDTF tier (Spark ≥3.5 TABLE(...) PARTITION
    BY): the engine shuffles each partition to one worker instance,
    so per-partition Python state replaces a window + filter when the
    per-group logic outgrows SQL. State is O(k) per partition
    regardless of partition size (insertion into a sorted bounded
    list — same contract as Misra–Gries in operators/sketch.py).
    """

    def __init__(self):
        self._top: list[tuple[int, int]] = []  # (-n_chars, doc_id)

    def eval(self, row):  # noqa: D102 (fixed contract)
        import bisect

        bisect.insort(self._top, (-row["n_chars"], row["doc_id"]))
        if len(self._top) > TOPK_K:
            self._top.pop()

    def terminate(self):  # noqa: D102
        for i, (neg, doc_id) in enumerate(self._top, 1):
            yield doc_id, -neg, i


def topk_per_source(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Top-``TOPK_K`` documents per source by length via
    the TABLE-argument UDTF: ``PARTITION BY source`` routes each
    source's rows to one UDTF instance. Equivalent to the
    row_number window (the oracle) — the point is the API surface
    and the bounded-state per-partition contract."""
    spark.udtf.register("topk_docs_udtf", TopKPerPartition)
    docs.select("doc_id", "source", "n_chars").createOrReplaceTempView(
        "__topk_in"
    )
    return spark.sql(
        """
        SELECT t.doc_id, p.source, t.n_chars, t.rank
        FROM topk_docs_udtf(
            TABLE(__topk_in) PARTITION BY source ORDER BY doc_id
        ) t
        JOIN __topk_in p ON t.doc_id = p.doc_id
        """
    )
