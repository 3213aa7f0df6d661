"""Probabilistic record linkage (Fellegi & Sunter 1969).

Reference scope note: the reference pipeline has no entity-resolution
surface; this extends the curation family (near-dup detection finds
COPIES, linkage finds the SAME ENTITY under field noise — the
dedup-across-sources problem every multi-source training corpus has).

The classic decision model: for each candidate pair, compare K
fields; each field agreement multiplies the match likelihood by
``m/u`` and each disagreement by ``(1−m)/(1−u)``, where

- ``m`` = P(field agrees | pair IS a match) — supplied by the
  caller (domain knowledge / EM estimate; constants here so the
  result is deterministic and oracle-checkable), and
- ``u`` = P(field agrees | pair is NOT a match) — ESTIMATED FROM
  THE DATA, exactly: for two random records, agreement probability
  is Σ_v nA(v)·nB(v) / (NA·NB) — a value-frequency aggregate, no
  sampling, no RNG.

Total weight = Σ ln of the per-field factors. Pairs above
``upper`` are matches, below ``lower`` non-matches, between —
clerical review (the three-way FS decision).

Scale shape: candidate pairs come from an equi-join on a BLOCKING
key (never all-pairs — the LSH-band discipline applied to entity
resolution); u-probabilities are per-field value-count aggregates
(map-side combinable, value-set-sized); the weight is a map-only
expression over the blocked pairs. Every stage is a hash
aggregate/join — nothing quadratic, nothing collected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: u-probability clamp bound: keeps ln(m/u) and ln((1-m)/(1-u)) finite
#: when a field has zero (u=0) or total (u=1) cross-frame agreement.
#: SQL twins must use the same literal (GREATEST(LEAST(u, 1-1e-12), 1e-12)).
_U_EPS = 1e-12


def field_u_probability(
    a: DataFrame, b: DataFrame, col: str
) -> DataFrame:
    """Exact random-pair agreement probability of ``col`` across
    frames ``a`` × ``b``: one row ``(u)`` with
    u = Σ_v nA(v)·nB(v) / (NA·NB). NULL never agrees (inner join on
    the value). Integer numerators — engine-exact until the final
    divide."""
    ca = a.groupBy(F.col(col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__na")
    )
    cb = b.groupBy(F.col(col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__nb")
    )
    hits = ca.join(cb, "__v").agg(
        F.sum(F.col("__na") * F.col("__nb")).alias("__hits")
    )
    na = a.agg(F.count(F.lit(1)).alias("__ta"))
    nb = b.agg(F.count(F.lit(1)).alias("__tb"))
    return (
        hits.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            # try_divide: an EMPTY side makes NA·NB = 0, which throws
            # under ANSI — surface NULL instead (there are no pairs
            # to weight in that case anyway).
            F.try_divide(
                F.coalesce("__hits", F.lit(0)).cast("double"),
                F.col("__ta").cast("double") * F.col("__tb"),
            ).alias("u")
        )
    )


def fs_link(
    a: DataFrame,
    b: DataFrame,
    id_a: str,
    id_b: str,
    block_col: str,
    fields: list[tuple[str, float]],
    lower: float = 0.0,
    upper: float = 4.0,
) -> DataFrame:
    """Fellegi–Sunter linkage of ``a`` × ``b``.

    ``fields`` is ``[(column, m), ...]`` — columns present in BOTH
    frames (caller normalizes beforehand), compared for equality,
    with the caller's m-probability. u-probabilities are estimated
    exactly per field (:func:`field_u_probability`) and ride along
    as a one-row broadcast. Returns one row per blocked candidate
    pair: both ids, each field's agreement flag, the total ln-weight
    (6 dp), and the three-way ``decision``
    (match / possible / non_match).
    """
    ua = None
    for col, _m in fields:
        u1 = field_u_probability(a, b, col).select(
            F.col("u").alias(f"__u_{col}")
        )
        ua = u1 if ua is None else ua.crossJoin(u1)
    pa = a.select(
        F.col(id_a).alias("__ida"),
        F.col(block_col).alias("__blk"),
        *[F.col(c).alias(f"__a_{c}") for c, _ in fields],
    )
    pb = b.select(
        F.col(id_b).alias("__idb"),
        F.col(block_col).alias("__blk"),
        *[F.col(c).alias(f"__b_{c}") for c, _ in fields],
    )
    pairs = pa.join(pb, "__blk").crossJoin(F.broadcast(ua))
    weight: Column = F.lit(0.0)
    out_cols = [F.col("__ida").alias("id_a"), F.col("__idb").alias("id_b")]
    for col, m in fields:
        agree = (
            F.col(f"__a_{col}").isNotNull()
            & F.col(f"__b_{col}").isNotNull()
            & (F.col(f"__a_{col}") == F.col(f"__b_{col}"))
        )
        # Clamp u into (eps, 1-eps): a field with zero cross-frame
        # value overlap gives u = 0 (log -> NULL under non-ANSI, error
        # under ANSI; +inf in DuckDB), and a constant field gives
        # u = 1, breaking the disagreement term symmetrically. The
        # clamp caps the evidence at ~27.6 nats instead of diverging;
        # the SQL twins apply the identical GREATEST/LEAST fold so the
        # engines stay bit-equal.
        u = F.greatest(
            F.least(F.col(f"__u_{col}"), F.lit(1.0 - _U_EPS)),
            F.lit(_U_EPS),
        )
        term = F.when(agree, F.log(F.lit(m) / u)).otherwise(
            F.log((1.0 - F.lit(m)) / (1.0 - u))
        )
        weight = weight + term
        out_cols.append(agree.alias(f"agree_{col}"))
    return pairs.select(
        *out_cols,
        F.round(weight, 6).alias("weight"),
        F.when(weight >= upper, F.lit("match"))
        .when(weight <= lower, F.lit("non_match"))
        .otherwise(F.lit("possible"))
        .alias("decision"),
    )
