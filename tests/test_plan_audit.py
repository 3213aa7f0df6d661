"""CI guardrail: no headline query may slip a cartesian product, an
unexpected conditioned nested-loop join, or a row-at-a-time Python
UDF into its physical plan (tools/plan_audit.py, in-process)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from bench import HEADLINE
from tools.plan_audit import (
    BNLJ_ALLOWED,
    CARTESIAN_ALLOWED,
    PY_UDF_ALLOWED,
    audit_plan,
)

QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", [n for n in HEADLINE if n in QUERIES])
def test_headline_plan_is_scale_clean(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    a = audit_plan(plan)
    if name not in CARTESIAN_ALLOWED:
        assert not a["cartesian"], f"{name}: CartesianProduct in plan"
    if name not in BNLJ_ALLOWED:
        assert not a["bnlj"], f"{name}: conditioned BNLJ in plan"
    if name not in PY_UDF_ALLOWED:
        assert not a["py_udf"], f"{name}: row-at-a-time Python UDF"


def test_exchange_counts_pinned(spark, sf_dir):
    """Shuffle-count regression net: every headline query's physical
    plan must contain EXACTLY the number of Exchange operators it had
    when its shape was last reviewed (tools/plan_pins.json). A diff
    here is not necessarily a bug — a deliberate plan improvement
    updates the pin — but an ACCIDENTAL extra shuffle in a refactor
    is exactly what this catches. Regenerate pins with the snippet in
    the file's git history / SCALE.md.

    The cache is cleared first: earlier tests leave persist()-pinned
    subtrees (the prefix-sum machinery's layout pins) in the
    CacheManager, which substitutes InMemoryRelations into fresh
    plan builds and changes the printed Exchange count — the pins
    are defined against UNCACHED plans."""
    spark.catalog.clearCache()
    import json
    import os

    pins_path = os.path.join(
        os.path.dirname(__file__), "..", "tools", "plan_pins.json"
    )
    with open(pins_path) as fh:
        pins = json.load(fh)
    diffs = {}
    for name, expected in pins.items():
        if name not in QUERIES:
            continue
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        got = audit_plan(plan)["exchanges"]
        if got != expected:
            diffs[name] = (expected, got)
    assert not diffs, f"exchange-count drift (expected, got): {diffs}"
