"""Event-stream batch operators: tumbling windows, sessionization,
JSON property extraction (SURVEY.md §2.6 north-star surface; the
reference itself has no temporal operators — its only temporal column
is a partition date).

All timestamps are handled in UTC (session config) and surfaced as
epoch seconds so results compare exactly across engines regardless of
parquet ms/ns precision (FIXTURES.md caveat).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    window: str = "1 hour",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling-window aggregate via ``F.window`` — count and value
    sum per (window, keys). Pass ``slide`` < ``window`` for hopping
    (overlapping) windows: each row is expanded to its window/slide
    memberships BEFORE the aggregate. The same expression works
    unchanged under Structured Streaming with a watermark (see
    streaming module).

    Scale: one shuffle on (window, keys); partial aggregation runs
    map-side so the exchange carries one row per window per task —
    for hopping windows the payload scales with #windows × overlap,
    still independent of row count.
    """
    keys = keys or ["event_type"]
    win = (
        F.window(F.col(ts_col), window)
        if slide is None
        else F.window(F.col(ts_col), window, slide)
    )
    return (
        df.groupBy(win.alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("bigint").alias("ws"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time
    since the user's previous event exceeds ``gap_seconds``. Classic
    lag + cumulative-sum over a per-user window.

    Scale: one shuffle on the user key; each user's events sort
    within a partition. Hot users (bot traffic) are the skew risk —
    AQE skew-split does not apply to window functions, so a real
    deployment bounds per-user event counts upstream or splits by
    (user, day) first.
    """
    epoch = F.unix_timestamp(F.col(ts_col)).cast("bigint")
    w_order = Window.partitionBy(user_col).orderBy(ts_col)
    w_running = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = epoch - F.lag(epoch).over(w_order)
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    with_sessions = df.withColumn("__epoch", epoch).withColumn(
        "session_idx", F.sum(is_new).over(w_running).cast("bigint")
    )
    return (
        with_sessions.groupBy(user_col, "session_idx")
        .agg(
            F.min("__epoch").alias("session_start"),
            F.max("__epoch").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def json_prop(
    df: DataFrame, json_col: str = "props", path: str = "$.k", alias: str = "k"
) -> DataFrame:
    """Extract a JSON property from a string column
    (``get_json_object``) — the events table's ``props`` column is a
    JSON string, per the reference's schema-on-read spirit."""
    return df.withColumn(
        alias, F.get_json_object(F.col(json_col), path).cast("int")
    )


def resample_fill(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    freq: str = "1 hour",
) -> DataFrame:
    """Time-series resample with gap filling: bucket counts per
    (period, key) over a DENSE period spine — empty periods appear
    with count 0 (the shape chart/feature pipelines need; a plain
    groupBy silently drops empty buckets).

    The spine is built engine-side with ``sequence()`` + explode from
    the global min/max bucket (an all-to-one agg of two timestamps —
    negligible), cross-joined with the distinct key set and
    left-joined against the real counts. At 100 TB the spine is tiny
    (periods × keys) while the counts aggregate does the heavy
    lifting map-side, so the only wide shuffle is the groupBy."""
    trunc_unit = freq.split()[-1]
    h = F.date_trunc(trunc_unit, F.col(ts_col))
    counts = df.select(h.alias("__h"), F.col(key_col)).groupBy(
        "__h", key_col
    ).agg(F.count(F.lit(1)).alias("__n"))
    bounds = df.agg(
        F.date_trunc(trunc_unit, F.min(ts_col)).alias("__mn"),
        F.date_trunc(trunc_unit, F.max(ts_col)).alias("__mx"),
    )
    spine = bounds.select(
        F.explode(
            F.expr(f"sequence(__mn, __mx, interval {freq})")
        ).alias("__h")
    )
    keys = df.select(key_col).distinct()
    full = spine.crossJoin(keys)
    return (
        full.join(counts, ["__h", key_col], "left")
        .select(
            F.unix_seconds(F.col("__h")).alias("period_s"),
            F.col(key_col),
            F.coalesce("__n", F.lit(0)).cast("long").alias("n_events"),
        )
    )
