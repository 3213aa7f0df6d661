"""Grouped-map Pandas UDF operators (``applyInPandas``).

The reference has no UDFs at all (SURVEY.md §2.5); these exist for
the training-pipeline surface where per-group Python/numpy logic is
genuinely needed. Rules of engagement (the module exists to model
them):

- Built-in expressions first — a z-score IS expressible with window
  functions, and ``grouped_zscore`` has an exact SQL oracle for that
  reason. ``applyInPandas`` earns its place when the per-group logic
  outgrows SQL (model scoring, per-group fits, custom resampling).
- Grouped-map shuffles the full group to one task: groups must fit
  in executor memory. At 100 TB group by something bounded (user,
  day, document) — never a handful of mega-groups (that's what the
  salted/aggregate paths are for).
- Arrow batches in/out; pandas float64 matches Spark DOUBLE, so
  6-dp-rounded results hash-match the SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_zscore(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    alias: str = "z",
) -> DataFrame:
    """Per-group z-score ((v − mean) / sample-std) via
    ``applyInPandas`` — the canonical grouped-map shape. Sample std
    (ddof=1) matches SQL ``STDDEV_SAMP``; single-row groups and
    zero-variance groups yield NULL exactly as the window form does.

    The output schema reuses the INPUT field types for the group/id
    columns (ADVICE r1: hardcoded int/long threw Arrow cast errors —
    or silently narrowed — under string/decimal keys).
    """
    from pyspark.sql import types as T

    in_type = {f.name: f.dataType for f in df.schema.fields}
    out_schema = T.StructType(
        [
            T.StructField(group_col, in_type[group_col]),
            T.StructField(id_col, in_type[id_col]),
            T.StructField(alias, T.DoubleType()),
        ]
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].to_numpy(dtype=np.float64)
        std = v.std(ddof=1) if len(v) > 1 else np.nan
        mean = v.mean()
        with np.errstate(invalid="ignore", divide="ignore"):
            z = np.round((v - mean) / std, 6)
        z = np.where(np.isfinite(z), z, np.nan)
        return pd.DataFrame(
            {
                group_col: pdf[group_col],
                id_col: pdf[id_col],
                alias: z,
            }
        )

    return (
        df.select(group_col, id_col, value_col)
        .groupBy(group_col)
        .applyInPandas(zscore, out_schema)
    )


def trimmed_mean(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.1,
    hi: float = 0.9,
    alias: str = "trimmed_mean",
) -> DataFrame:
    """Per-group trimmed mean via a pandas GROUPED-AGG UDF — the true
    UDAF tier (scalar result per group) completing the UDF surface
    next to the grouped-map (``applyInPandas``), Arrow grouped-map
    (``applyInArrow``), iterator (``mapInPandas``) and UDTF forms.
    Values strictly outside the [lo, hi] interpolated quantile fences
    are dropped before averaging — the robust-mean companion to
    :func:`~...relational.winsorize` (which clips instead of drops).

    A grouped-agg UDF ships each group's VALUE COLUMN only (not the
    whole row) through Arrow and returns one scalar — lighter than a
    grouped-map for aggregation shapes. Same memory contract: a
    group's values must fit one executor; pandas ``quantile`` uses
    linear interpolation, matching SQL ``percentile``/
    ``quantile_cont`` so the oracle is exact."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _trimmed(v: pd.Series) -> float:
        qlo, qhi = v.quantile(lo), v.quantile(hi)
        kept = v[(v >= qlo) & (v <= qhi)]
        return float(np.round(kept.mean(), 6))

    # NB: a grouped-agg pandas UDF cannot share an agg() with
    # non-pandas aggregates (INVALID_PANDAS_UDF_PLACEMENT), so the
    # group size is a pandas UDAF too.
    @pandas_udf("long")
    def _n(v: pd.Series) -> int:
        return len(v)

    return df.groupBy(group_col).agg(
        _n(value_col).alias("n"), _trimmed(value_col).alias(alias)
    )


def cogroup_asof_merge(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    left_cols: list[str],
    right_val: str,
    alias: str = "matched",
) -> DataFrame:
    """Per-key AS-OF merge via **cogrouped** ``applyInPandas``
    (``pd.merge_asof`` inside each key's cogroup) — the third Pandas
    interop shape next to grouped-map and map-iter: BOTH sides
    shuffle once on the key, then each key's two groups meet in one
    Python task. Use it when the per-key merge logic outgrows the
    union+running-last SQL form (``relational.as_of_join``) — e.g.
    tolerance windows, nearest-direction switches, or model-driven
    matching — while keeping the exact same shuffle posture.

    Scale: state per task is one key's rows on both sides (bounded
    by the key grain, same caveat as grouped-map); the Arrow
    transfer is 2 columnar batches per key, not per row.

    Ties on (key, ts) in the right side must be pre-deduplicated by
    the caller (``merge_asof`` keeps the last row in sort order,
    which is otherwise nondeterministic).
    """
    from pyspark.sql import types as T

    lt = {f.name: f.dataType for f in left.schema.fields}
    out_schema = T.StructType(
        [T.StructField(c, lt[c]) for c in left_cols]
        + [T.StructField("ts_epoch", T.LongType()),
           T.StructField(alias, T.DoubleType())]
    )

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=[c.name for c in out_schema])
        lpdf = lpdf.sort_values(ts_col, kind="mergesort")
        rpdf = rpdf[[ts_col, right_val]].sort_values(
            ts_col, kind="mergesort"
        )
        m = pd.merge_asof(lpdf, rpdf, on=ts_col, direction="backward")
        out = m[left_cols].copy()
        out["ts_epoch"] = (
            m[ts_col].astype("datetime64[us]").astype("int64")
        )  # microsecond epoch (matches DuckDB epoch_us)
        out[alias] = m[right_val].astype("float64")
        return out

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(merge, out_schema)
    )
