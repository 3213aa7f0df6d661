"""r12 experiment probe — q_spearman "single-spine dual-rank"
alternative (VERDICT r11 next-round #4).

Hypothesis under test: explode each lineitem row to (col_id, value)
once and run ONE bucketed tie-rank spine keyed (col_id, group),
instead of the landed form's tiny quantity-rank machinery + price
prefix-sum over the pair spine. This script

1. builds the exploded variant, value-identical to q_spearman
   (asserted against the landed form on the probe SF), and
2. times both forms min-of-3 through the noop sink in ONE session
   (order given by argv, so two runs give the order-balanced A/B).

Usage::

    python plans/r12/spearman_explode_probe.py <sf_dir> <landed|exploded first>

Run it twice with opposite orders; read the per-form minima.
Structural accounting (why the hypothesis should lose, written
before measuring): the landed form's rank pass shuffles only the
per-(group, quantity) count grain (~50 values x 3 groups after
map-side partial agg); the exploded form shuffles the FULL
(col, group, value) grain (~|distinct prices| ~ 600k rows at sf1 =
the spine itself), and then still needs the same pairing pass PLUS
a near-spine-sized join of the price ranks back to the pair spine
(replacing a broadcast-offsets prefix sum over the pinned spine).
Strictly more shuffled bytes, one extra wide join.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def exploded_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fifa_data_pipeline_spark.plans.extended27 import (
        _footer_minmax_int,
    )
    from fifa_data_pipeline_spark.operators.relational import (
        grouped_running_sums_bucketed,
    )
    from fifa_data_pipeline_spark.sources.io import read_table

    li = read_table(spark, sf_dir, "lineitem")
    g = "l_returnflag"
    qb = _footer_minmax_int(f"{sf_dir}/lineitem.parquet", "l_quantity")
    pb = _footer_minmax_int(
        f"{sf_dir}/lineitem.parquet", "l_extendedprice"
    )
    if qb is None or pb is None:
        raise RuntimeError("footer stats required for the probe")
    lo = min(qb[0], pb[0])
    hi = max(qb[1], pb[1])
    # ONE exploded (col_id, group, value) rank spine for both columns.
    cv = F.explode(
        F.array(
            F.struct(
                F.lit(0).alias("c"),
                F.col("l_quantity").cast("double").alias("v"),
            ),
            F.struct(
                F.lit(1).alias("c"),
                F.col("l_extendedprice").cast("double").alias("v"),
            ),
        )
    ).alias("cv")
    counts = (
        li.select(F.col(g), cv)
        .select(g, "cv.c", "cv.v")
        .groupBy("c", g, "v")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    cum = grouped_running_sums_bucketed(
        counts, ["c", g], "v", ["__cnt"], bounds=(lo, hi)
    )
    ranks = cum.select(
        "c",
        g,
        "v",
        (
            2 * (F.col("__cnt_rsum") - F.col("__cnt"))
            + F.col("__cnt")
            + 1
        ).alias("r2"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    rx_t = ranks.filter(F.col("c") == 0).select(
        g, F.col("v").alias("__qv"), F.col("r2").alias("rx")
    )
    ry_t = ranks.filter(F.col("c") == 1).select(
        g, F.col("v").alias("__pv"), dec(F.col("r2")).alias("ry")
    )
    spine = (
        li.select(
            g,
            F.col("l_quantity").cast("double").alias("__qv"),
            F.col("l_extendedprice").cast("double").alias("__pv"),
        )
        .join(F.broadcast(rx_t), [g, "__qv"])
        .groupBy(g, "__pv")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.sum(dec(F.col("rx"))).alias("__srx"),
            F.sum(dec(F.col("rx")) * dec(F.col("rx"))).alias("__srx2"),
        )
    )
    paired = spine.join(ry_t, [g, "__pv"])
    m = paired.groupBy(g).agg(
        F.sum(dec(F.col("__cnt"))).alias("n"),
        F.sum("__srx").alias("sx"),
        F.sum(dec(F.col("__cnt")) * F.col("ry")).alias("sy"),
        F.sum("__srx2").alias("sxx"),
        F.sum(F.col("ry") * F.col("__srx")).alias("sxy"),
        F.sum(dec(F.col("__cnt")) * F.col("ry") * F.col("ry")).alias(
            "syy"
        ),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return m.select(
        g,
        F.col("n").cast("bigint").alias("n_rows"),
        F.when(
            (dx > 0) & (dy > 0),
            F.round(num / (F.sqrt(dx) * F.sqrt(dy)), 6),
        ).alias("spearman_rho"),
    )


def main() -> int:
    sf_dir = sys.argv[1]
    order = sys.argv[2] if len(sys.argv) > 2 else "landed"

    import __spark_entry__ as entrymod
    from fifa_data_pipeline_spark.session import get_spark

    spark = get_spark("spearman-probe")
    queries = entrymod.queries()
    landed = lambda: queries["q_spearman"](spark, sf_dir)  # noqa: E731
    expl = lambda: exploded_spearman(spark, sf_dir)  # noqa: E731

    # Equality first (sorted rows; rho is a 6-dp round of identical
    # integer moments, so == is exact).
    a = sorted(map(tuple, landed().collect()))
    b = sorted(map(tuple, expl().collect()))
    assert a == b, f"exploded variant diverges:\n{a}\n{b}"
    print("value-identical: OK", file=sys.stderr)

    queries["q_flagship"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()  # session warmup, bench.py protocol

    import gc

    jvm = spark.sparkContext._jvm  # noqa: SLF001

    def timed(build) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            gc.collect()
            jvm.System.gc()
        return round(best, 4)

    forms = [("landed", landed), ("exploded", expl)]
    if order != "landed":
        forms = forms[::-1]
    out = {name: timed(build) for name, build in forms}
    print({"sf_dir": sf_dir, "order": order, **out})
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
