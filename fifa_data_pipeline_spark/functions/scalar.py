"""Scalar expression helpers (SURVEY.md §2.2, P5-P7).

All JVM-side Column expressions — no Python UDFs — so they stay
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def concat_label(left: Column | str, right: Column | str, sep: str = " - ") -> Column:
    """NULL-propagating string concat with a literal separator (P7).

    Mirrors the reference's ``CONCAT(league_name, ' - ',
    nationality_name)`` (``prefect/spark/fifa_spark.py:83``). Spark's
    ``concat`` returns NULL if any input is NULL — deliberately NOT
    ``concat_ws`` (which skips NULLs); the oracle uses ``||`` which
    has the same NULL propagation (SURVEY.md §5).
    """
    left = F.col(left) if isinstance(left, str) else left
    right = F.col(right) if isinstance(right, str) else right
    return F.concat(left, F.lit(sep), right)


def avg_int(col: Column | str) -> Column:
    """``CAST(AVG(x) AS INTEGER)`` (P6, ``fifa_spark.py:88-90``).

    Spark's double→int cast truncates toward zero (BigQuery rounds);
    we follow Spark semantics — the oracle must be written as
    ``CAST(TRUNC(AVG(x)) AS INTEGER)`` (SURVEY.md §5 gotchas).
    """
    return F.avg(col).cast("int")


def cast_columns(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """Typed projection (P5): the engine analogue of the reference's
    CTAS cast lists (``etl_kaggle_to_big_query.py:92-107,141-159``).

    ``casts`` maps column name → target Spark type name; untouched
    columns pass through unchanged, preserving column order.
    """
    return df.select(
        *[
            F.col(c).cast(casts[c]).alias(c) if c in casts else F.col(c)
            for c in df.columns
        ]
    )
