"""Central query/oracle registry backing ``__spark_entry__``.

Each domain module contributes a ``QUERIES`` dict of
``name -> (spark, sf_dir) -> DataFrame`` and an ``ORACLES`` dict of
``name -> DuckDB SQL``. Names without an oracle get the driver's
weaker rows-only check (documented per query).
"""

from __future__ import annotations

from fifa_data_pipeline_spark.plans.flagship import (
    FLAGSHIP_ORACLE,
    flagship,
    flagship_sql,
)

QUERIES = {
    "q_flagship": flagship,
    "q_flagship_sql": flagship_sql,
}

ORACLES = {
    "q_flagship": FLAGSHIP_ORACLE,
    "q_flagship_sql": FLAGSHIP_ORACLE,
}


def _merge(module) -> None:
    QUERIES.update(module.QUERIES)
    ORACLES.update(module.ORACLES)


def _load() -> None:
    from fifa_data_pipeline_spark.plans import (
        extended,
        extended2,
        extended3,
        extended4,
        extended5,
        extended6,
        northstar,
        parity,
        streaming_queries,
    )

    _merge(parity)
    _merge(northstar)
    _merge(extended)
    _merge(extended2)
    _merge(extended3)
    _merge(extended4)
    _merge(extended5)
    _merge(extended6)
    _merge(streaming_queries)


_load()
