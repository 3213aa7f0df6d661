"""Shared operator utilities."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exploded(
    df: DataFrame,
    arr: Column | str,
    alias: str,
    keep: Sequence[str | Column] = (),
    pos_alias: str | None = None,
) -> DataFrame:
    """Explode a COMPUTED array via an outer generate plus a
    null-filter on the generated attribute.

    A plain inner ``explode`` triggers Catalyst's
    ``InferFiltersFromGenerate`` rule, which clones the full generator
    expression into a ``size(e) > 0 AND isnotnull(e)`` pre-filter.
    For cheap arrays that is a win (empty rows die before the
    Generate); for expensive array builders — n-gram ``transform``
    chains, MinHash/SimHash band hashes over a signature fold — the
    clone evaluates the builder two extra times per input row, and
    higher-order expressions run interpreted (outside whole-stage
    codegen). Measured at sf0.1: 12× on 4-gram construction, −39% on
    MinHash band explode, −30% on token explode. Outer generates are
    exempt from the rule, and the null-filter on the generated
    ATTRIBUTE (cheap, codegen'd) restores inner-explode row
    semantics.

    Caveat: an inner explode KEEPS null array elements; this drops
    them. Every engine array builder (tokenizers, gram/shingle
    builders, band hashers) is null-free, so the rewrite is
    value-identical where used. Do not use it on arrays that may
    legitimately hold NULL elements.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in keep]
    if pos_alias is not None:
        gen = F.posexplode_outer(arr).alias(pos_alias, alias)
    else:
        gen = F.explode_outer(arr).alias(alias)
    return df.select(*cols, gen).filter(F.col(alias).isNotNull())
