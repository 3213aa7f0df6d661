"""Every registered query with an oracle must match DuckDB at sf0.001
(row count + columns + order-insensitive value hash) — the same
comparison the driver runs at sf0.01."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tools.check_oracle import _hash_rows

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    if name not in ORACLES:
        assert len(srows) >= 0  # rows-only: must at least execute
        return
    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert _hash_rows(scols, srows) == _hash_rows(dcols, drows)


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)
